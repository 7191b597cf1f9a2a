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

  // ---- reciprocal-rank fusion (x77) ----

  private def ranked(rows: (Long, Long, Long)*) =
    rows.toSeq.toDF("qid", "nid", "rnk")

  test("rrf: two-list agreement at rank 2 beats a single rank-1 hit") {
    // C=60: doc 20 contributes floor(1e6/62)*2 = 32258, doc 10 only
    // floor(1e6/61) = 16393 — consensus wins, the RRF selling point
    val a = ranked((1L, 10L, 1L), (1L, 20L, 2L))
    val b = ranked((1L, 30L, 1L), (1L, 20L, 2L))
    val out = Retrieval.rrfFuse(Seq(a, b)).orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.head == ((20L, 32258L, 1L)))
    // 10 and 30 tie at 16393 — deterministic nid-asc break
    assert(out.map(_._1).toSeq == Seq(20L, 10L, 30L))
    assert(out(1)._2 == 16393L && out(2)._2 == 16393L)
  }

  test("rrf: top-k cap and per-query isolation") {
    val a = ranked((1 to 8).map(i => (1L, i.toLong, i.toLong)): _*)
    val b = ranked((2L, 99L, 1L))
    val out = Retrieval.rrfFuse(Seq(a, b), k = 3).collect()
    assert(out.count(_.getLong(0) == 1L) == 3)
    assert(out.filter(_.getLong(0) == 2L).map(_.getLong(1)).toSeq == Seq(99L))
  }

  test("rrf: single-ranker fuse preserves the input order") {
    val a = ranked((1L, 5L, 1L), (1L, 7L, 2L), (1L, 3L, 3L))
    val out = Retrieval.rrfFuse(Seq(a)).orderBy("rnk").collect()
      .map(_.getLong(1)).toSeq
    assert(out == Seq(5L, 7L, 3L))
  }
}
