package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance selection (x73) contracts. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target docs share vocabulary {alpha beta gamma}; the off-target doc
  // is disjoint {zeta eta}; the probe doc mixes both worlds
  private def docsDf = Seq(
    (1L, "en", "alpha beta gamma alpha"),
    (2L, "en", "beta gamma alpha beta"),
    (3L, "xx", "zeta eta zeta eta"),
    (4L, "xx", "alpha beta zeta"),
    (5L, "xx", "")) // empty: no features, never selected
    .toDF("doc_id", "lang", "text")

  private def run(df: org.apache.spark.sql.DataFrame, k: Int = 10) =
    Dsir.dsirSelect(df, "doc_id", "text", col("lang") === "en", k = k)

  test("target-vocabulary docs outrank off-target docs; empty docs are absent") {
    val out = run(docsDf).orderBy("rnk").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(out.map(_._1).length == 4, "empty doc must not be scored")
    // the two target-vocab docs rank above the disjoint off-target doc
    val rank = out.map(_._1).zipWithIndex.toMap
    assert(rank(1L) < rank(3L) && rank(2L) < rank(3L),
      s"target docs should outrank the disjoint doc: $out")
    // the mixed doc sits between the pure-target and pure-off docs
    assert(rank(4L) < rank(3L), s"mixed doc should beat pure off-target: $out")
  }

  test("selection is deterministic under repartition and truncates at k") {
    def sel(df: org.apache.spark.sql.DataFrame) =
      run(df, k = 2).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val a = sel(docsDf)
    assert(a == sel(docsDf.repartition(7)))
    assert(a.size == 2 && a.map(_._3) == Set(1L, 2L))
  }

  test("one-token docs get unigram features only (no descending sequence)") {
    val df = Seq((1L, "en", "alpha"), (2L, "xx", "alpha")).toDF("doc_id", "lang", "text")
    // must not throw, and both docs score (same single feature)
    val out = run(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 2L) && out(1L) == out(2L))
  }

  test("sf0.001 quality gate: selection enriches the 'en' target fraction") {
    val docs = graft.Tables.documents(spark, sfDir)
    val base = docs.filter(col("lang") === "en").count().toDouble /
      docs.count().toDouble
    val sel = run(docs, k = 20)
      .join(docs.select("doc_id", "lang"), "doc_id")
    val got = sel.filter(col("lang") === "en").count().toDouble / 20.0
    assert(got > base,
      s"DSIR should enrich the target: selected en-frac $got vs corpus $base")
  }
}
