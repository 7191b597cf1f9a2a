package graft.neardup

import graft.SparkSpec

/** Hand-checkable fixtures for the sub-document dedup additions:
  * paragraph keep-first dedup (x60) and the duplicated-n-gram profile
  * (x61).
  */
class ParaDedupSpec extends SparkSpec {
  import spark.implicits._

  test("paragraph dedup keeps first occurrence only and rebuilds in order") {
    val docs = Seq(
      (1L, "alpha beta\nshared para text\ngamma"),
      (2L, "shared para text\ndelta"), // loses the shared para to doc 1
      (3L, "solo"),
      (4L, "dup\ndup"), // within-doc repeat: second copy dropped too
      (5L, ""), // no paragraphs at all — still present in the output
      (6L, "  \nkeep me")) // whitespace-only segment dropped, pos gap ok
      .toDF("doc_id", "text")
    val out = ParaDedup.dedupParagraphs(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 3L, "alpha beta\nshared para text\ngamma")))
    assert(out(2L) == ((2L, 1L, "delta")))
    assert(out(3L) == ((1L, 1L, "solo")))
    assert(out(4L) == ((2L, 1L, "dup")))
    assert(out(5L) == ((0L, 0L, "")))
    assert(out(6L) == ((1L, 1L, "keep me")))
  }

  test("dup-gram profile counts grams shared with other docs") {
    val docs = Seq(
      (1L, "a b c d"),  // grams: "a b c", "b c d"
      (2L, "a b c x"),  // grams: "a b c", "b c x" — shares "a b c"
      (3L, "zz yy ww"), // one gram, unshared
      (4L, "one two")) // shorter than k: zero grams, still present
      .toDF("doc_id", "text")
    val out = NearDup.dupGramProfile(docs, "doc_id", "text", k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((1L, 0L, 0.0)))
    assert(out(4L) == ((0L, 0L, 0.0)))
  }
}
