package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical top-k retrieval over the corpus — the BM25 scoring family
  * (Robertson/Sparck-Jones probabilistic weighting with TF saturation
  * and length normalization), the standard tool for query-driven
  * corpus exploration and for mining training data relevant to a seed
  * set ("retrieve documents like these benchmark questions").
  *
  * Two deliberate deviations from textbook BM25, both for cross-engine
  * exactness (and both rank-preserving in the ways that matter):
  *
  *  - RATIONAL idf: `(N - df + 0.5) / (df + 0.5)` — classic BM25 takes
  *    the ln of this. ln is the one op IEEE-754 does NOT require
  *    correctly rounded (libm vs JVM may differ in the last bit), so
  *    the log is dropped rather than hashed-on-hope. Per TERM the map
  *    is strictly monotone (rarer term ⇒ bigger weight, same as with
  *    ln); multi-term sums weight rare terms more sharply than the
  *    log-scaled original — documented, deterministic, and the shape
  *    100 TB cares about (the join structure) is identical.
  *  - FIXED-POINT contributions: each term's `idf · tf_sat` is floored
  *    to integer millionths BEFORE the per-(query, doc) sum. Double
  *    addition is order-dependent and a shuffled groupBy sums in
  *    arbitrary order — summing exact integers instead makes the score
  *    independent of partitioning (the same trick the integer-embed
  *    family uses), at a bounded 1e-6-per-term score quantization.
  *
  * Everything upstream of the floor is a fixed sequence of IEEE
  * +,-,*,/ on integer-exact doubles — both engines replay it bitwise.
  *
  * Scale shape: the distinct query-term set (fixed query count ×
  * bounded per-doc vocabulary — broadcast-sized) screens the token
  * explode BEFORE the index aggregation, so the only shuffled index is
  * the query-term postings, Σ_{query terms} df(term) rows — never the
  * full corpus×vocabulary index; df/tf stay exact because filtering by
  * term drops no occurrence of a query term. (First spelling built the
  * full index and then joined 99% of it away: measured 22.3× wall for
  * 10× data at the 5M-doc probe, spill-bound on a ~1e9-row shuffle.)
  * Terms present in more than `maxDfFrac` of the corpus are dropped
  * from SCORING (their rational idf ≈ 1 — no ranking signal, dominant
  * join cost; the classical stopword-pruning move, expressed as a
  * FRACTION so the cap scales with the corpus instead of silently
  * emptying the index as N grows past any absolute bound). True df —
  * computed BEFORE the cap — still feeds idf for surviving terms.
  * The query side is a fixed-count sample: its term list stays
  * broadcast-sized, so the candidate join is broadcast on one side and
  * the per-doc side never shuffles until the (qid, nid) partial-agg
  * sum. Cost ∝ Σ_{query terms} df(term) — linear in corpus size for a
  * fixed query count, linear in the query count, never all-pairs. The
  * further pruning path at web scale is impact ordering (WAND /
  * block-max): skip postings that cannot reach the current top-k
  * bound — noted, not implemented; the frac-cap is the first-order
  * version of the same idea.
  */
object Retrieval {

  /** Top-k BM25-scored corpus docs per query doc. Output one row per
    * (query, hit): (qid, nid, score, rnk) — `score` in integer
    * millionths, `rnk` the dense 1-based rank (score DESC, nid ASC
    * deterministic tiebreak). The query doc itself is excluded.
    */
  def bm25TopK(corpus: DataFrame, idCol: String, textCol: String,
               queryPred: Column, k1: Double = 1.2, b: Double = 0.75,
               k: Int = 5, maxDfFrac: Double = 0.9): DataFrame = {
    val toks = corpus.select(col(idCol).as("nid"),
      TextAnalysis.tokens(col(textCol)).as("tk"))
    // corpus stats: one 1-row aggregate (docs INCLUDING token-less ones;
    // integer sum, so avgdl is one exact division both engines replay)
    val stats = toks.agg(count(lit(1)).as("n"), sum(size(col("tk"))).as("sl"))
    // query term lists, tokenized directly from the sampled query docs
    // (array_distinct ≡ the grouped-tf distinctness of the old spelling)
    val qterms0 = corpus.filter(queryPred)
      .select(col(idCol).as("qid"),
        explode(array_distinct(TextAnalysis.tokens(col(textCol))))
          .as("term"))
    // the distinct query-term set is broadcast-sized (fixed query count
    // × bounded per-doc vocabulary), and it prunes the INDEX BUILD
    // itself: only postings for query terms survive the explode, so the
    // (nid, dl, term) aggregation shuffles Σ_{query terms} df(term)
    // rows, not the full corpus×vocabulary index (~1e9 (doc, term)
    // pairs at the 5M-doc probe — measured 22.3× for 10× data when the
    // full index was built and then 99% of it dropped on the qterms
    // join; scoring only ever consumes query-term postings, and df for
    // non-query terms was computed only to be discarded)
    val qset = qterms0.select("term").distinct()
    // query-term inverted index with per-doc length riding along:
    // (nid, dl, term, tf). Filtering by term drops no (doc, term) pair
    // OF A QUERY TERM, so tf and df stay exact for every surviving term
    val tf = toks
      .select(col("nid"), size(col("tk")).as("dl"),
        explode(col("tk")).as("term"))
      .join(broadcast(qset), Seq("term"))
      .groupBy("nid", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    // true document frequency, computed BEFORE the cap so idf is honest
    val dfs = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // query terms annotated with df + corpus stats and CAP-FILTERED
    // here, so the fractional cap prunes the candidate join too (capped
    // terms never reach the corpus-sized side; the bound is the floor
    // of one IEEE multiply both engines replay)
    val qterms = qterms0
      .join(dfs, Seq("term"))
      .crossJoin(stats)
      .filter(col("df") <= floor(lit(maxDfFrac) * col("n").cast("double")))
    // every float literal is computed HERE and interpolated into the
    // oracle SQL by the caller — neither engine does constant
    // arithmetic of its own, so the doubles agree bitwise
    val avgdl = col("sl").cast("double") / col("n").cast("double")
    val idf = ((col("n") - col("df")).cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val tfsat = col("tf").cast("double") * lit(k1 + 1) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val scored = tf
      .join(broadcast(qterms), Seq("term"))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        floor(idf * tfsat * lit(1e6)).as("c"))
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("nid").asc)
    scored.groupBy("qid", "nid").agg(sum(col("c")).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of per-query
    * ranked lists — the standard hybrid-retrieval combiner: each ranker
    * contributes `1 / (kRrf + rank)` per hit and the fused order is the
    * sum, so agreement between rankers beats a high rank in any single
    * one. This is how sparse (BM25) and dense (embedding) retrieval are
    * fused in production RAG / training-data-mining stacks — RRF needs
    * no score calibration, only ranks, which is exactly why it
    * cross-engine-hashes: ranks are integers, and the contribution is
    * spelled as `floor(1000000.0 / (kRrf + rnk))` — ONE correctly-
    * rounded IEEE division of integer-exact doubles, floored to
    * millionths (the bm25 fixed-point trick) — so the fused score is an
    * order-independent integer sum both engines replay bitwise.
    *
    * Inputs are (qid, nid, rnk) frames — any ranker output with a
    * 1-based rank column. Scale shape: a union of top-k lists is
    * O(queries · k · rankers) rows — tiny next to the rankers
    * themselves — and the fuse is one partial-agg sum plus a per-query
    * window over ≤ k·rankers rows. Output: (qid, nid, score, rnk) with
    * the deterministic (score DESC, nid ASC) tiebreak, top `k` only.
    */
  def rrfFuse(rankers: Seq[DataFrame], kRrf: Int = 60, k: Int = 5): DataFrame = {
    val contrib = rankers
      .map(_.select(col("qid"), col("nid"),
        floor(lit(1000000.0) /
          (lit(kRrf.toDouble) + col("rnk").cast("double"))).as("c")))
      .reduce(_ unionAll _)
    val w = Window.partitionBy("qid").orderBy(col("score").desc, col("nid").asc)
    contrib.groupBy("qid", "nid").agg(sum(col("c")).as("score"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
  }
}
