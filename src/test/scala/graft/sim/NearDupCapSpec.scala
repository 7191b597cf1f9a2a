package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the x57 bucket-cap guard (round-13 verdict item 1): the
  * embedding near-dup pair enumeration is OUTPUT-quadratic on clustered
  * geometry at a loose threshold (v2-500k measured ~1.6e11 true pairs —
  * no candidate scheme can fix an answer that size), so
  * `embeddingNearDupReps` bounds each LSH bucket's pair contribution to
  * C(bucketCap, 2) via a deterministic per-bucket member cap, and
  * `nearDupBucketLoad` reports the truncation per bucket (no silent
  * caps). These tests pin: (1) the cap is a NO-OP below occupancy
  * (shipped-corpus outputs are byte-identical to the uncapped path),
  * (2) on a synthetic clustered corpus the capped operator completes
  * with output inside the analytic bound and deterministically,
  * (3) the load report's n_kept column is exactly least(n_ids, cap).
  */
class NearDupCapSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** A deliberately pathological corpus for pair enumeration: `n`
    * vectors in ONE tight cluster (unit direction + tiny per-id jitter
    * on one component), all pairwise cosine ≈ 1 ≫ threshold — the true
    * pair set is C(n, 2) and every member lands in the same bucket of
    * every table.
    */
  private def clustered(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val v = Array.fill(8)(1.0f)
      v(i % 8) = 1.0f + (i % 13) * 1e-4f // distinct vectors, same direction
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("bucket cap is a no-op below occupancy: shipped corpus output " +
    "is identical with and without it") {
    val capped = Similarity.embeddingNearDupReps(emb, "vec_id", "embedding",
      dim = 64, threshold = 0.25, nbits = 4, tables = 8,
      bucketCap = Some(256))
    val exact = Similarity.embeddingNearDupReps(emb, "vec_id", "embedding",
      dim = 64, threshold = 0.25, nbits = 4, tables = 8, bucketCap = None)
    assert(capped.exceptAll(exact).isEmpty && exact.exceptAll(capped).isEmpty)
  }

  test("on clustered geometry the cap bounds output to tables·2^nbits·" +
    "C(cap,2) and keeps the lowest ids") {
    val n = 500
    val cap = 10
    val out = Similarity.embeddingNearDupReps(clustered(n), "vec_id",
      "embedding", dim = 8, threshold = 0.9, nbits = 2, tables = 2,
      bucketCap = Some(cap)).cache()
    val rows = out.count()
    // analytic hard bound — the uncapped answer would be C(500,2)=124750
    val bound = 2L * 4 * (cap.toLong * (cap - 1) / 2)
    assert(rows > 0 && rows <= bound, s"$rows pairs vs bound $bound")
    // the kept subset is the per-bucket LOWEST ids: with one dominant
    // cluster direction, every surviving id is small
    val maxId = out.agg(max(greatest(col("id_a"), col("id_b"))))
      .collect()(0).getLong(0)
    assert(maxId < 4L * cap, s"max surviving id $maxId — cap not engaged?")
    // deterministic: a re-run yields the identical pair set
    val again = Similarity.embeddingNearDupReps(clustered(n), "vec_id",
      "embedding", dim = 8, threshold = 0.9, nbits = 2, tables = 2,
      bucketCap = Some(cap))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }

  test("nearDupBucketLoad reports occupancy with n_kept = least(n_ids, cap)") {
    val load = Similarity.nearDupBucketLoad(clustered(100), "vec_id",
      "embedding", dim = 8, nbits = 2, tables = 2, bucketCap = 10).cache()
    // every row satisfies the cap identity
    assert(load.filter(col("n_kept") =!= least(col("n_ids"), lit(10L)))
      .count() == 0)
    // the clustered corpus genuinely truncates somewhere (that is the
    // report's whole point)
    assert(load.filter(col("n_kept") < col("n_ids")).count() > 0)
    // total banded mass is preserved: Σ n_ids = n · tables
    val total = load.agg(sum(col("n_ids"))).collect()(0).getLong(0)
    assert(total == 100L * 2)
    load.unpersist()
  }
}
