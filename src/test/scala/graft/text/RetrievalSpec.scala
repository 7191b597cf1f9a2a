package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BM25 retrieval (x70) contract: ranking follows tf saturation, idf
  * rarity weighting, and length normalization; the fractional df-cap
  * drops ubiquitous terms from scoring; scores are exact integers
  * (fixed-point millionths) independent of partitioning.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 is the query; "rare" appears in docs 2 and 3 only, "common"
  // everywhere. Doc 2 is shorter than doc 3, doc 4 shares only the
  // ubiquitous term.
  private def corpus = Seq(
    (1L, "rare common alpha"),
    (2L, "rare common beta"),
    (3L, "rare common beta beta beta beta beta beta"),
    (4L, "common gamma delta"),
    (5L, "common epsilon zeta"))
    .toDF("doc_id", "text")

  private def topk(maxDfFrac: Double = 0.9) =
    Retrieval.bm25TopK(corpus, "doc_id", "text",
      col("doc_id") === 1L, k = 5, maxDfFrac = maxDfFrac)

  test("rare-term sharers rank, ubiquitous-only docs are capped out") {
    // "common" is in 5/5 docs: floor(0.9 * 5) = 4 < 5 drops it from
    // scoring, so docs 4/5 (common-only) get NO hit row at all and
    // docs 2/3 score on "rare" alone
    val out = topk().orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq == Seq(2L, 3L),
      "shorter doc 2 outranks doc 3 at equal tf (length normalization)")
    assert(out.map(_._3).toSeq == Seq(1L, 2L))
    assert(out.forall(_._2 > 0))
    // same matched term, same tf — only length differs, so scores differ
    assert(out.map(_._2).distinct.length == 2)
  }

  test("raising the df-cap to 1.0 admits the ubiquitous term") {
    // floor(1.0 * 5) = 5 keeps "common": docs 4 and 5 now appear,
    // below the rare-term sharers (rational idf of a 5/5 term ≈ 0.1)
    val out = topk(maxDfFrac = 1.0).orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getLong(3)))
    assert(out.map(_._1).take(2).toSet == Set(2L, 3L))
    assert(out.map(_._1).toSet == Set(2L, 3L, 4L, 5L))
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("scores are partition-independent exact integers") {
    val a = topk().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Retrieval.bm25TopK(corpus.repartition(7), "doc_id", "text",
        col("doc_id") === 1L, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b, "fixed-point contributions must make the sum order-free")
  }

  test("query doc is excluded and empty corpus yields empty output") {
    assert(!topk().collect().exists(_.getLong(1) == 1L))
    val empty = corpus.filter(col("doc_id") < 0L)
    assert(Retrieval.bm25TopK(empty, "doc_id", "text",
      col("doc_id") === 1L).count() == 0L)
  }
}
