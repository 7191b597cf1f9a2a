package graft.neardup

import graft.SparkSpec

/** Hand-checkable fixtures for exact duplicated-span removal (x79):
  * coverage by corpus-repeated k-grams, every-copy cutting, short-doc
  * passthrough, and in-document repetition.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int) =
    SpanDedup.removeDuplicatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("a cross-doc repeated k-gram is cut from BOTH copies") {
    // "one two three" repeats verbatim across docs 1 and 2 (k=3): all
    // three tokens go from each; the unique tails survive
    val out = run(Seq(
      (1L, "one two three alpha beta"),
      (2L, "gamma one two three delta"),
      (3L, "epsilon zeta eta")), k = 3)
    assert(out(1L) == ((5L, 3L, "alpha beta")))
    assert(out(2L) == ((5L, 3L, "gamma delta")))
    assert(out(3L) == ((3L, 0L, "epsilon zeta eta")))
  }

  test("overlapping dup grams merge into one covered span") {
    // docs 1/2 share a 4-token run; with k=3 that is two overlapping
    // dup grams covering positions 1..4 — four tokens cut, not six
    val out = run(Seq(
      (1L, "a b c d tailone"),
      (2L, "a b c d tailtwo")), k = 3)
    assert(out(1L) == ((5L, 4L, "tailone")))
    assert(out(2L) == ((5L, 4L, "tailtwo")))
  }

  test("in-document repetition counts as duplication") {
    // "x y z" occurs twice INSIDE doc 1 — both spans cut (the
    // suffix-array rule), even though no other doc shares it
    val out = run(Seq(
      (1L, "x y z mid x y z end"),
      (2L, "totally different words here")), k = 3)
    assert(out(1L)._1 == 8L)
    assert(out(1L)._2 == 6L)
    assert(out(1L)._3 == "mid end")
  }

  test("docs shorter than k pass through whole, normalized") {
    val out = run(Seq(
      (1L, "  Tiny  DOC  "),
      (2L, "tiny doc")), k = 3) // same 2 tokens — but no gram exists
    assert(out(1L) == ((2L, 0L, "tiny doc")))
    assert(out(2L) == ((2L, 0L, "tiny doc")))
  }

  test("a fully-duplicated doc is wiped to empty but keeps its length") {
    val out = run(Seq(
      (1L, "p q r s"),
      (2L, "p q r s"),
      (3L, "")), k = 4)
    assert(out(1L) == ((4L, 4L, "")))
    assert(out(2L) == ((4L, 4L, "")))
    assert(out(3L) == ((0L, 0L, "")))
  }
}
