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

  test("boilerplate removal drops over-threshold paragraphs from every doc") {
    val docs = Seq(
      (1L, "alpha beta\nnav header\ngamma"),
      (2L, "nav header\ndelta"),     // nav header in 2 docs > maxDocFreq=1:
      (3L, "nav header"),            //   dropped everywhere, doc 3 empties
      (4L, "rare\nrare"),            // within-doc repeat of a 1-doc para kept BOTH times
      (5L, ""))                      // paragraph-less doc stays present
      .toDF("doc_id", "text")
    val out = ParaDedup.removeBoilerplate(docs, "doc_id", "text", maxDocFreq = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 2L, "alpha beta\ngamma")))
    assert(out(2L) == ((2L, 1L, "delta")))
    assert(out(3L) == ((1L, 0L, "")))
    assert(out(4L) == ((2L, 2L, "rare\nrare")))
    assert(out(5L) == ((0L, 0L, "")))
  }

  test("boilerplate removal at maxDocFreq=2 keeps two-doc paragraphs") {
    val docs = Seq(
      (1L, "shared\nuniq1"),
      (2L, "shared\nuniq2"),
      (3L, "everywhere"), (4L, "everywhere"), (5L, "everywhere"))
      .toDF("doc_id", "text")
    val out = ParaDedup.removeBoilerplate(docs, "doc_id", "text", maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "shared\nuniq1") // df=2 ≤ 2: kept in both docs
    assert(out(2L) == "shared\nuniq2")
    assert(out(3L) == "" && out(4L) == "" && out(5L) == "") // df=3 > 2
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
