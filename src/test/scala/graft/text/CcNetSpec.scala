package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** CCNet-style LM bucketing (x74) contracts. */
class CcNetSpec extends SparkSpec {
  import spark.implicits._

  // six docs: two targets define the LM over {alpha beta gamma}; the
  // others range from pure-target to fully-OOV vocabulary
  private def docsDf = Seq(
    (1L, "en", "alpha beta gamma alpha"),
    (2L, "en", "beta gamma alpha beta"),
    (3L, "xx", "alpha beta gamma"), // pure target vocab → head
    (4L, "xx", "alpha zeta eta"),   // mixed
    (5L, "xx", "zeta eta theta"),   // fully OOV → tail
    (6L, "xx", "")) // zero tokens: excluded, like CCNet's empty lines
    .toDF("doc_id", "lang", "text")

  private def run(df: org.apache.spark.sql.DataFrame) =
    CcNet.ccnetBuckets(df, "doc_id", "text", col("lang") === "en")

  test("target-vocab docs land in head, OOV docs in tail; empties drop") {
    val out = run(docsDf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(!out.contains(6L), "zero-token doc must be excluded")
    // the LM's own training docs are the top third
    assert(out(1L)._2 == "head" && out(2L)._2 == "head", s"$out")
    assert(out(5L)._2 == "tail", s"fully-OOV doc not tail: $out")
    // scores are anti-monotone in OOV fraction
    assert(out(3L)._1 > out(4L)._1 && out(4L)._1 > out(5L)._1, s"$out")
  }

  test("bucketing is deterministic under repartition") {
    def b(df: org.apache.spark.sql.DataFrame) = run(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(b(docsDf) == b(docsDf.repartition(5)))
  }

  test("sf0.001: buckets split the corpus into near-thirds") {
    val docs = graft.Tables.documents(spark, sfDir)
    val sizes = run(docs).groupBy("bucket").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = sizes.values.sum
    assert(sizes.keySet == Set("head", "middle", "tail"), s"$sizes")
    // exact-percentile tertiles: each bucket within a couple of rows
    // of n/3 unless scores tie heavily (they don't on this fixture)
    sizes.values.foreach(c =>
      assert(math.abs(c - n / 3.0) <= math.max(2, n * 0.1), s"$sizes"))
  }
}
