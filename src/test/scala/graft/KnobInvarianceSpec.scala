package graft

/** Result invariance under the AQE scale knob
  * (`spark.sql.adaptive.coalescePartitions.initialPartitionNum`).
  *
  * Verify applies the scale-sweep shuffle sizing on the premise that
  * every oracle result is partition-count independent — asserted since
  * round 12 but never tested (round-12 advice). A partition-SENSITIVE
  * query shape (sampling predicate, limit without a total order,
  * float aggregation order) could silently change oracle outcomes when
  * the knob changes the post-shuffle partition count. This spec runs
  * the shapes the advice named — plus the catalog's fixed-point
  * retrieval/scoring paths, whose integer-sum design exists exactly to
  * buy this property — under initialPartitionNum 1 vs 512 (bracketing
  * any value the env knob can set) and requires row-identical output.
  */
class KnobInvarianceSpec extends SparkSpec {

  private val KNOB = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

  /** Collect a query's result as a canonical sorted multiset. */
  private def rows(q: String): Seq[String] = {
    val df = SparkEntry.queries(q)(spark, sfDir)
    val out = df.collect().map(_.toString).toSeq.sorted
    spark.catalog.clearCache() // cached frames must not leak the OTHER knob's run
    out
  }

  private def underKnob(n: String)(body: => Seq[String]): Seq[String] = {
    spark.conf.set(KNOB, n)
    try body finally spark.conf.unset(KNOB)
  }

  // the advice's sensitive shapes: sampling (x24 stratified, x05/x70's
  // fixed-count query sample), ranked limit (q03, x55 WindowGroupLimit),
  // float aggregation (q01 percentile bounds, q42 grouped percentiles,
  // x09 quality scores), plus the fixed-point integer-sum scorers whose
  // design claim IS partition-order independence (x70/x86/x77).
  // x87 (not x86): at the sf0.001 fixture the auto-branch routes x86 to
  // the PLAIN spelling, so probing x86 alone would leave the impact
  // scorer's windows/θ-pruning/broadcasts out of the knob sweep
  // (round-13 advice) — the forced-impact entry probes them directly.
  private val probes = Seq(
    "x24_stratified_sample", "x05_cosine_topk", "q03_iot_top5_hot",
    "x55_domain_cap", "q01_iot_clean", "q42_grouped_percentiles",
    "x09_text_quality", "x70_bm25_topk", "x86_bm25_wand",
    "x87_bm25_wand_forced", "x77_rrf_fusion")

  probes.foreach { q =>
    test(s"$q: result is invariant under initialPartitionNum 1 vs 512") {
      val lo = underKnob("1")(rows(q))
      val hi = underKnob("512")(rows(q))
      assert(lo == hi,
        s"$q drifted under the AQE scale knob: ${lo.size} vs ${hi.size} rows")
    }
  }
}
