package graft.sim

import graft.SparkSpec
import graft.ops.Sampling
import org.apache.spark.sql.functions._

/** Properties of the round-9 additions: JL projection (x67/x68),
  * mutual-kNN communities (x65), and the deterministic split (x66).
  */
class JlCommunitySpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("jlProject is linear-exact and partition-independent") {
    val a = emb.select(col("vec_id"),
      Similarity.jlProject(col("embedding").cast("array<double>"), 64, 16).as("p"))
    val b = emb.repartition(7).select(col("vec_id"),
      Similarity.jlProject(col("embedding").cast("array<double>"), 64, 16).as("p"))
    // bit-equal projected doubles regardless of partitioning
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // each component is a ±1 combination: |p_t| ≤ Σ|v_i| (Achlioptas)
    val bad = a.join(emb, "vec_id")
      .filter(exists(col("p"), p =>
        p > aggregate(col("embedding").cast("array<double>"),
          lit(0.0), (acc, x) => acc + abs(x))))
      .count()
    assert(bad == 0)
  }

  test("JL rerank returns exact-space sims, subset of shortlist") {
    val qp = col("vec_id") % 17 === 0
    val rr = Similarity.cosineTopKJlRerank(emb, "vec_id", "embedding",
      qp, dim = 64, r = 16, shortlist = 10, k = 3)
    val sl = Similarity.cosineTopKJl(emb, "vec_id", "embedding",
      qp, dim = 64, r = 16, k = 10).select("qid", "nid")
    // every reranked hit came from the projected shortlist
    assert(rr.join(sl, Seq("qid", "nid"), "left_anti").count() == 0)
    // rerank sims are EXACT-space cosines (match brute force where shared)
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", qp, k = 5)
      .select(col("qid"), col("nid"), col("sim").as("bsim"))
    assert(rr.join(brute, Seq("qid", "nid"))
      .filter(col("sim") =!= col("bsim")).count() == 0)
  }

  test("mutual-kNN communities: only mutual pairs cluster, min-id labels") {
    import spark.implicits._
    // a triangle (1,2,3 mutually near), a one-way arc 4→1 (never mutual),
    // and a mutual pair (5,6)
    val g = Seq(
      (1L, 2L, 0.99), (2L, 1L, 0.99), (1L, 3L, 0.99), (3L, 1L, 0.99),
      (2L, 3L, 0.98), (3L, 2L, 0.98),
      (4L, 1L, 0.99), // not reciprocated
      (5L, 6L, 0.97), (6L, 5L, 0.97),
      (5L, 1L, 0.10), (1L, 5L, 0.10)) // below threshold both ways
      .toDF("qid", "nid", "sim")
    val cc = Similarity.mutualKnnClusters(g, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("splitAssign partitions every row once with stable proportions") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val s1 = Sampling.splitAssign(docs, "doc_id")
    assert(s1.count() == docs.count())
    val byS = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS.keySet.subsetOf(Set("train", "val", "test")))
    val n = docs.count().toDouble
    assert(byS.getOrElse("train", 0L) / n > 0.6, s"train share off: $byS")
    // assignment is a pure function of the key: re-running on a
    // repartitioned frame yields the identical labels
    val s2 = Sampling.splitAssign(docs.repartition(13), "doc_id")
      .select("doc_id", "split")
    assert(s1.select("doc_id", "split").exceptAll(s2).isEmpty)
  }
}
