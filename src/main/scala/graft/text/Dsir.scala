package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling") — the
  * hashed-n-gram importance ranking that picks, out of a raw corpus,
  * the documents most distributionally similar to a small target set
  * (here: a predicate over the corpus itself, e.g. `lang = 'en'`).
  *
  * Faithful to the paper's shape: features are word unigrams AND
  * bigrams hashed into a fixed bucket space (the dimension is the
  * bucket count, not the vocabulary), a bag-of-hashed-ngrams model is
  * fit on target vs raw, and documents are ranked by their aggregate
  * importance. One deliberate departure for cross-engine exactness:
  * the paper's log-ratio weight log p̂_t(b) − log p̂_r(b) is replaced
  * by the integer micro-probability difference
  *   w_micro(b) = (c_t(b)+1)·10⁶ div (N_t+B) − (c_r(b)+1)·10⁶ div (N_r+B)
  * (Laplace-smoothed, same sign and same zero set as the log ratio) —
  * all arithmetic is Long-exact, so every doc's score and the whole
  * selection replay bit-identically in the DuckDB oracle, like
  * [[TextAnalysis.qualityClassifier]]'s w_micro. The token hash is the
  * x12 rolling-hash chain (portable integer arithmetic; BMP-only
  * contract documented at [[TextAnalysis.rollingHash]]).
  *
  * Scale shape (100 TB): the corpus is tokenized ONCE into a cached
  * one-row-per-doc frame; both passes (bucket counting, scoring)
  * re-explode from it. Bucket counts partial-aggregate to ≤ B rows
  * before their exchange; the weight table is BUCKET-bounded (256
  * rows here — broadcast is free and stays free at any corpus size,
  * unlike a vocabulary-keyed table), so scoring is a broadcast join +
  * one partially-aggregated per-doc sum. The final top-k compiles to
  * TakeOrderedAndProject (k·p rows to the driver, no global sort) and
  * the output rank window runs post-limit over ≤ k rows (the W1
  * discipline). At Long range: c·10⁶ fits until a bucket holds 9·10¹²
  * occurrences — ~10¹⁵ tokens over 256 buckets — beyond which widen
  * SCALE down to 10³.
  */
object Dsir {
  private val M = 1000000007L

  /** x12's portable token hash: base-31 polynomial over code units. */
  private def tokHash(tok: Column): Column = aggregate(
    split(tok, ""), lit(7L),
    (a, ch) => pmod(a * lit(31L) + ascii(ch), lit(M)))

  /** Hashed unigram + bigram buckets from an array of ALREADY-COMPUTED
    * token hashes (with multiplicity — the model counts occurrences,
    * not presence). Bigram hash chains two token hashes with the x12
    * base-131 step; the `size >= 2` guard keeps one-token docs at zero
    * bigrams (sequence(1, 0) would DESCEND — the wordGramsCol pitfall).
    *
    * `th` MUST be a materialized column (cached/stored), never the
    * hash-expression tree inlined: Catalyst re-evaluates a captured
    * expression at every `element_at` inside the lambda, which turns
    * the bigram pass O(tokens²)-interpreted per doc — measured 62 s vs
    * 0.7 s on the sf0.1 corpus. [[dsirSelect]] guarantees this by
    * hashing into the cached staged frame.
    */
  private[text] def featureBuckets(th: Column, buckets: Int): Column = {
    val b = lit(buckets.toLong)
    val uni = transform(th, h => pmod(h, b))
    val bi = when(size(th) >= 2,
      transform(sequence(lit(1), size(th) - 1),
        i => pmod(pmod(element_at(th, i) * lit(131L) +
          element_at(th, i + 1), lit(M)), b)))
      .otherwise(array().cast("array<bigint>"))
    concat(uni, bi)
  }

  /** Rank the corpus by target-likeness and keep the top `k`.
    * Output: (idCol, score_micro, rnk) — the selected subset, highest
    * importance first, id-tiebroken. Docs with zero features (empty
    * text) have no score and cannot be selected, mirroring the paper's
    * n-gram model being undefined on empty documents.
    */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
                 targetPred: Column, buckets: Int = 256,
                 k: Int = 100): DataFrame = {
    // hash each token ONCE into the cached frame — see featureBuckets'
    // materialization contract
    val staged = df.select(col(idCol), targetPred.as("is_t"),
      transform(TextAnalysis.tokens(col(textCol)), tokHash(_)).as("th"))
      .cache()
    val feats = staged.select(col(idCol), col("is_t"),
      explode(featureBuckets(col("th"), buckets)).as("b"))
    val cnts = feats.groupBy("b").agg(
      count(lit(1)).as("c_r"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"))
    // B-bounded totals: aggregate the bucket table, not the corpus
    val weights = cnts
      .crossJoin(broadcast(cnts.agg(sum("c_r").as("n_r"),
        sum("c_t").as("n_t"))))
      .select(col("b"),
        (expr(s"(c_t + 1L) * 1000000L DIV (n_t + $buckets)") -
          expr(s"(c_r + 1L) * 1000000L DIV (n_r + $buckets)"))
          .as("w_micro"))
    val scored = feats.join(broadcast(weights), Seq("b"))
      .groupBy(idCol).agg(sum("w_micro").as("score_micro"))
    scored.orderBy(col("score_micro").desc, col(idCol).asc).limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score_micro").desc, col(idCol).asc))
        .cast("long"))
  }
}
