package graft.neardup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag (and drop) training documents that
  * share long word n-grams with an evaluation set — the standard guard
  * against test-set leakage when assembling LLM training corpora
  * (13-gram overlap in GPT-3's data work; the n is a parameter here).
  *
  * Scale design: both sides are reduced to (id, shingle) inverted
  * indexes (`NearDup.shingles` — distinct word k-grams per doc), and
  * contamination is ONE equi-join on the shingle key followed by one
  * partial-aggregated groupBy. The eval index is tiny relative to a
  * 100 TB training corpus (benchmarks are a few thousand docs), so
  * Catalyst broadcast-joins it and the training side never shuffles;
  * with a large eval set the join degrades gracefully to a shuffled
  * equi-join on the gram key. No cross join at any size.
  */
object Decontaminate {

  /** Per-training-doc contamination report: distinct eval-set k-grams
    * the doc shares, for docs sharing at least `minShared`.
    * Output: doc_id, n_shared (descending signal, deterministic).
    */
  def report(train: DataFrame, eval: DataFrame, idCol: String,
             textCol: String, k: Int = 8, minShared: Int = 1): DataFrame = {
    val trainSh = NearDup.shingles(train, idCol, textCol, k)
    // distinct gram strings only — doc identity on the eval side is
    // irrelevant to the overlap test, and the dedup keeps the broadcast
    // side minimal
    val evalSh = NearDup.shingles(eval, idCol, textCol, k)
      .select("shingle").distinct()
    trainSh.join(evalSh, Seq("shingle"), "left_semi")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Bloom-gated contamination report — the 100 TB spelling of
    * [[report]]: the eval gram index is collapsed to a fixed-size
    * broadcast bit array ([[Bloom]]), every training gram is screened
    * map-side, and ONLY bloom-hit grams reach the exact-confirm join.
    * Per bloom-hit doc: `n_bloom` (grams the filter flags, false
    * positives included) and `n_shared` (exactly-confirmed grams —
    * [[report]]'s number; 0 for pure-false-positive docs, so the FP
    * exposure is itself part of the checked output). No false negatives
    * by construction: every doc [[report]] flags appears here with the
    * identical `n_shared`.
    *
    * Scale shape: build is a constant-size `bit_or` aggregate over the
    * (small) eval index; probe is whole-stage-codegen arithmetic inside
    * the training scan stage; the exact-confirm join input shrinks from
    * all-corpus grams to the bloom-hit fraction — on a clean corpus,
    * near-zero rows cross a join at all. Because bit positions derive
    * from the portable md5 base, the oracle rebuilds the same bit array
    * and replays membership — FPs and all — so `n_bloom` is
    * hash-checked, not rows-only.
    */
  def bloomReport(train: DataFrame, eval: DataFrame, idCol: String,
                  textCol: String, k: Int = 8, mBits: Long = 258048L,
                  bloomK: Int = 3): DataFrame = {
    val trainSh = NearDup.shingles(train, idCol, textCol, k)
    val evalSh = NearDup.shingles(eval, idCol, textCol, k)
      .select("shingle").distinct().cache()
    val blm = Bloom.build(evalSh, "shingle", mBits, bloomK)
    val hits = Bloom.probe(trainSh, "shingle", blm, mBits, bloomK)
      .filter(col("bloom_hit"))
    hits.join(evalSh.withColumn("__ex", lit(1)), Seq("shingle"), "left")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_bloom"), count(col("__ex")).as("n_shared"))
  }

  /** The filtered training set: docs from `train` that share fewer than
    * `minShared` distinct k-grams with the eval set (anti join on the
    * report — map-side after the broadcast-friendly overlap join).
    */
  def clean(train: DataFrame, eval: DataFrame, idCol: String,
            textCol: String, k: Int = 8, minShared: Int = 1): DataFrame =
    train.join(report(train, eval, idCol, textCol, k, minShared)
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Per-EVAL-doc k-gram coverage — [[report]] looked from the training
    * side and answered binarily ("is this train doc contaminated");
    * this is the fractional complement the eval owner reads: for each
    * eval doc, what fraction of its distinct word k-grams appears
    * verbatim anywhere in the training corpus. seen_frac ≈ 1 means the
    * benchmark is effectively memorization-reachable even after
    * doc-level decontamination (partial overlaps below `minShared`
    * survive [[clean]]); ≈ 0 certifies novelty. TOTAL over eval docs
    * (shorter than k ⇒ zeros).
    *
    * Scale shape: the TRAIN side reduces to a distinct gram set — the
    * corpus-sized half never carries doc ids into the shuffle and the
    * join output is bounded by the EVAL gram count; one semi-join + two
    * partial aggs, linear in the corpus, output sized by the eval set.
    */
  def coverage(train: DataFrame, eval: DataFrame, idCol: String,
               textCol: String, k: Int = 8): DataFrame = {
    val trainGrams = NearDup.shingles(train, idCol, textCol, k)
      .select("shingle").distinct()
    val evalSh = NearDup.shingles(eval, idCol, textCol, k)
    val totals = evalSh.groupBy("id").agg(count(lit(1)).as("n_grams"))
    val hits = evalSh.join(trainGrams, Seq("shingle"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n_seen"))
    eval.select(col(idCol).as("doc_id"))
      .join(totals.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .join(hits.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_seen"), lit(0L)).as("n_seen"),
        round(coalesce(col("n_seen") * lit(1.0) / col("n_grams"), lit(0.0)), 4)
          .as("seen_frac"))
  }
}
