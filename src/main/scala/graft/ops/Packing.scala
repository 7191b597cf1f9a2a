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

  /** Exact packed-sequence inventory with document SPLITTING — the
    * faithful GPT packing: the shard's token stream is cut every
    * `budget` tokens, a document contributes a span to EVERY sequence
    * it overlaps, and every sequence holds exactly `budget` tokens
    * except the shard's trailing partial. Output per (shard, seq_id):
    * contributing-doc count, exact token count, first/last doc.
    *
    * Scale shape: `assignments`' one shard-keyed window, then a
    * map-side interval decomposition — each doc explodes into the
    * sequence bins it overlaps, bounded by ceil(n_tokens/budget)+1
    * rows per doc — and one partial-aggregated groupBy that reuses the
    * shard partitioning. Zero-token docs overlap no sequence and are
    * excluded before the explode (sequence() on a descending range
    * would throw otherwise).
    */
  def packSpans(df: DataFrame, idCol: String, textCol: String,
                budget: Int = 512, shards: Int = 8): DataFrame = {
    val b = lit(budget.toLong)
    assignments(df, idCol, textCol, budget, shards)
      .filter(col("n_tokens") > 0)
      .select(col("shard"), col("doc_id"), col("n_tokens"),
        (col("seq_id") * b + col("start_offset")).as("start_tok"))
      .withColumn("end_tok", col("start_tok") + col("n_tokens"))
      .select(col("shard"), col("doc_id"), col("start_tok"), col("end_tok"),
        explode(sequence(
          ((col("start_tok") - pmod(col("start_tok"), b)) / b).cast("long"),
          ((col("end_tok") - lit(1L) -
            pmod(col("end_tok") - lit(1L), b)) / b).cast("long"))).as("seq_id"))
      .withColumn("span_tokens",
        least(col("end_tok"), (col("seq_id") + 1) * b) -
          greatest(col("start_tok"), col("seq_id") * b))
      .groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("span_tokens").as("seq_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
  }
}
