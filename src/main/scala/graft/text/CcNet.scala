package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality bucketing (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data"): score every document under a language model trained on a
  * trusted target subset, then split the corpus into head / middle /
  * tail thirds by score — the standard pre-training data triage
  * (train on head+middle, drop or downweight tail).
  *
  * Integer-exact re-expression: CCNet's KenLM 5-gram perplexity
  * becomes a Laplace-smoothed UNIGRAM likelihood in micro-probability
  * space — p_micro(t) = (c_t(t)+1)·10⁶ div (N_t+V_t), OOV terms get
  * the unseen mass 10⁶ div (N_t+V_t) — and a doc's score is the
  * integer mean Σ p_micro div n_tokens (monotone in unigram
  * likelihood, i.e. anti-monotone in perplexity; higher = more
  * target-like). Every per-doc score is a Long the DuckDB oracle
  * replays bit-identically; only the two tertile thresholds are
  * interpolated doubles, computed by the SAME exact-percentile
  * pattern q01 uses (Spark `percentile` ≡ DuckDB `percentile_cont`,
  * proven hash-stable there), with the 1/3 and 2/3 fractions
  * interpolated as identical double literals on both sides.
  *
  * Scale shape (100 TB): one cached tokenize pass (the x50 staged
  * discipline); the LM is VOCABULARY-bounded (persist it in
  * production and skip the train pass on re-score — broadcast budget
  * caveat as x50); scoring is a broadcast left join + the 1-row OOV
  * frame attached via broadcast nested-loop (the q01
  * global-stats-then-local-apply pattern, no driver collect); the
  * per-doc sum partial-aggregates; the threshold aggregate is ONE
  * ObjectHashAggregate row broadcast back. Zero-token docs have no
  * likelihood and are excluded, as CCNet drops empty lines.
  */
object CcNet {

  /** Output: (idCol, score_micro, bucket ∈ head|middle|tail). */
  def ccnetBuckets(df: DataFrame, idCol: String, textCol: String,
                   targetPred: Column): DataFrame = {
    val staged = df.select(col(idCol), targetPred.as("is_t"),
      TextAnalysis.tokens(col(textCol)).as("toks")).cache()
    val terms = staged.select(col(idCol), col("is_t"),
      explode(col("toks")).as("term"))
    val tcnt = terms.filter(col("is_t"))
      .groupBy("term").agg(count(lit(1)).as("c_t"))
    // 1-row LM denominator: target token mass + target vocab size
    val denom = tcnt.agg((sum("c_t") + count(lit(1))).as("d_t"))
    val lm = tcnt.crossJoin(broadcast(denom))
      .select(col("term"), expr("(c_t + 1L) * 1000000L DIV d_t").as("p_micro"))
    val scored = terms
      .join(broadcast(lm), Seq("term"), "left")
      .crossJoin(broadcast(denom))
      .select(col(idCol),
        coalesce(col("p_micro"), expr("1000000L DIV d_t")).as("p"))
      .groupBy(idCol)
      .agg(expr("sum(p) DIV count(1)").as("score_micro"))
    val th = scored.agg(
      percentile(col("score_micro"), lit(1.0 / 3)).as("t1"),
      percentile(col("score_micro"), lit(2.0 / 3)).as("t2"))
    scored.crossJoin(broadcast(th))
      .select(col(idCol), col("score_micro"),
        when(col("score_micro") > col("t2"), "head")
          .when(col("score_micro") > col("t1"), "middle")
          .otherwise("tail").as("bucket"))
  }
}
