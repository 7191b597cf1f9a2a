package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Sampling}
import graft.text.TextAnalysis

/** End-to-end corpus curation — the composed training-data pipeline a
  * user of this library actually runs: quality-gate → language-gate →
  * canonical-fingerprint dedup (keep lowest doc id) → deterministic
  * downsample.
  *
  * Scale shape: the three gates and the fingerprint are COLUMN
  * expressions evaluated in ONE scan pass (not three self-joined
  * sub-pipelines — composing the DataFrame operators naively would scan
  * the corpus once per signal); the only shuffle is the dedup's
  * fingerprint window; the sample is a map-only arithmetic predicate.
  * At 100 TB: one pass over the corpus, one hash exchange on
  * fingerprints, byte-identical output on re-runs.
  */
object Curation {

  /** Curated corpus: doc_id, fingerprint, pred_lang for the kept docs.
    * `keepPer100` is the post-dedup sampling rate (see
    * `Sampling.hashBucket`).
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             lang: String = "en", keepPer100: Int = 50): DataFrame = {
    val enriched = docs.select(
      col(idCol).as("doc_id"),
      TextAnalysis.fingerprintCol(col(textCol)).as("fingerprint"),
      TextAnalysis.predLangCol(col(textCol)).as("pred_lang"),
      TextAnalysis.qualityBucketCol(col(textCol)).as("quality_bucket"))
    val gated = enriched.filter(
      col("quality_bucket") === "ok" && col("pred_lang") === lang)
    val deduped = Dedup.keepFirst(gated, Seq("fingerprint"),
      Seq(col("doc_id").asc))
    deduped
      .filter(Sampling.hashBucket(col("doc_id")) < keepPer100)
      .select("doc_id", "fingerprint", "pred_lang")
  }
}
