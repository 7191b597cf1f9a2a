package graft.neardup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {

  private val mBits = 63L * 64 // 4032 bits — small on purpose, FPs visible
  private val k = 3

  test("bloom membership: no false negatives, deterministic layout") {
    import spark.implicits._
    val keys = (0 until 200).map(i => s"key-$i").toDF("s")
    val blm = Bloom.build(keys, "s", mBits, k)
    val arr = blm.collect()(0).getSeq[Long](0)
    assert(arr.length == (mBits / Bloom.WordBits).toInt)
    assert(arr.forall(_ >= 0L), "63-bit words must stay non-negative")
    // every inserted key must hit (bloom contract: zero false negatives)
    val memberHits = Bloom.probe(keys, "s", blm, mBits, k)
      .filter(col("bloom_hit")).count()
    assert(memberHits == 200L)
    // rebuild under a different partitioning — identical array
    val arr2 = Bloom.build(keys.repartition(7), "s", mBits, k)
      .collect()(0).getSeq[Long](0)
    assert(arr === arr2)
  }

  test("bloom false-positive rate is small but nonzero at saturation") {
    import spark.implicits._
    val keys = (0 until 400).map(i => s"in-$i").toDF("s")
    val blm = Bloom.build(keys, "s", mBits, k)
    val out = (0 until 2000).map(i => s"out-$i").toDF("s")
    val fp = Bloom.probe(out, "s", blm, mBits, k)
      .filter(col("bloom_hit")).count()
    // 400 keys * 3 bits in 4032 bits → load ~0.26, fp ≈ (1-e^-0.3)^3 ≈ 1.7%
    assert(fp > 0L, "a saturated small filter should show SOME FPs (replayable)")
    assert(fp < 200L, s"FP rate out of band: $fp / 2000")
  }

  test("bloomReport ⊇ report with identical n_shared (exact-confirm)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val eval = docs.filter(col("doc_id") % 20 === 0)
    val exact = Decontaminate.report(train, eval, "doc_id", "text", k = 8)
      .withColumnRenamed("n_shared", "n_exact")
    val bloom = Decontaminate.bloomReport(train, eval, "doc_id", "text", k = 8)
    assert(bloom.count() > 0)
    // every exactly-contaminated doc appears, with the same shared count
    val joined = exact.join(bloom, Seq("doc_id"), "left")
    assert(joined.filter(col("n_shared").isNull ||
      col("n_shared") =!= col("n_exact")).count() == 0)
    // and n_bloom always dominates the exact count (FPs only add)
    assert(bloom.filter(col("n_bloom") < col("n_shared")).count() == 0)
  }
}
