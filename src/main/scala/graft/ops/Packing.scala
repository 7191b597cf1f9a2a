package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Sequence packing for LLM training: concatenate documents into
  * fixed-token-budget training sequences (GPT-style pack-and-split — a
  * doc is assigned to the sequence where it STARTS; the running token
  * stream is cut every `budget` tokens).
  *
  * Scale design: packing is per-SHARD, not global. A global
  * cumulative-sum window would funnel 100 TB through one ordering; real
  * pipelines pack each output shard independently (shard count scales
  * with the cluster, sequences never cross shards). Here the shard key
  * is `doc_id % shards` — deterministic, so the oracle replicates it —
  * and the one shuffle is the per-shard window sort. Everything else
  * (token count, bin arithmetic) is map-side codegen.
  */
object Packing {

  /** Per-document packing assignment: shard, seq_id within shard, token
    * count, and the doc's start offset inside its sequence.
    */
  def assignments(df: DataFrame, idCol: String, textCol: String,
                  budget: Int = 512, shards: Int = 8): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol).cast("long").as("doc_id"),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
      .withColumn("shard", col("doc_id") % shards)
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      // exclusive prefix sum = where this doc's first token lands in the
      // shard's concatenated stream; integer-divide by the budget → bin
      .withColumn("start_tok", col("cum_tokens") - col("n_tokens"))
      .select(col("shard"), (col("start_tok") / budget).cast("long").as("seq_id"),
        col("doc_id"), col("n_tokens"),
        (col("start_tok") % budget).as("start_offset"))
  }

  /** Packed-sequence summary: docs and tokens per (shard, seq_id) — the
    * shape a training-data writer consumes.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budget: Int = 512, shards: Int = 8): DataFrame =
    assignments(df, idCol, textCol, budget, shards)
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("seq_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
}
