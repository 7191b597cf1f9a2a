package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.text.{Pii, TextAnalysis}

/** Streaming corpus curation — the x41 gate/redact stages applied to a
  * document STREAM: stateless PII redaction + quality/language/
  * repetition gates, then exact dedup keyed on the redacted-text
  * fingerprint with state bounded by the event-time watermark
  * (`dropDuplicatesWithinWatermark`). One definition serves both the
  * backfill and the live path — the same batch-vs-incremental split the
  * reference runs as separate full-reload and cutoff DAGs
  * (HW-3/airflow/dags/iot_temperature.py:44-46 vs
  * HW-4/airflow/dags/iot_temperature.py:98-118).
  *
  * Scale notes: the gates are per-row column expressions with NO state,
  * and they run BEFORE the dedup so junk never enters the state store;
  * dedup state holds one fingerprint per unique kept doc inside the
  * watermark horizon. Keeper semantics differ by mode and are part of
  * the contract: streaming keeps the FIRST ARRIVAL of a fingerprint
  * (state decides), batch keeps the lowest doc_id (deterministic
  * re-runs) — identical results whenever arrival order follows doc_id.
  */
object CorpusStream {

  def curate(docs: DataFrame, lateness: String = "1 hour",
             lang: String = "en"): DataFrame = {
    val clean = docs
      .select(col("doc_id"), col("ts"),
        Pii.redactedCol(col("text")).as("text"))
      .filter(TextAnalysis.qualityBucketCol(col("text")) === "ok" &&
        TextAnalysis.predLangCol(col("text")) === lang &&
        !TextAnalysis.repetitiveCol(col("text")))
      .withColumn("fingerprint", TextAnalysis.fingerprintCol(col("text")))
    if (clean.isStreaming)
      clean.withWatermark("ts", lateness)
        .dropDuplicatesWithinWatermark("fingerprint")
    else
      Dedup.keepFirst(clean, Seq("fingerprint"), Seq(col("doc_id").asc))
  }
}
