package graft.tmpprobe

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY measurement harness (removed after the PLANS.md scaling
  * table is recorded — regenerate from the PLANS.md §"Observed scaling"
  * description): builds the synthetic 10× corpus used for the scaling
  * rows.
  *
  * Model (PLANS.md:198-206): corpus growth is LINEAR in pair density —
  * 10 Caesar-shifted copies of `documents` (shifted alphabets ⇒ no
  * cross-copy shingle overlap) and 10 id-shifted copies of
  * `embeddings`. Round-5 extension: the FACT tables (customer,
  * supplier, part, orders, lineitem, events) also get 10 key-shifted
  * copies — every key column shifts by copy·10⁸ so FK joins stay
  * consistent WITHIN a copy and never collide ACROSS copies; dims
  * (region, nation) stay fixed, as real dims do. Timestamps are left
  * unchanged: 10× rows in the same time window, the density model a
  * growing service actually produces.
  *
  * Output: `dirA` = the Caesar 10× corpus (full catalog runnable via
  * `SPARK_GRAFT_SF_DIR`); `dirB` = documents only, the prepended
  * `copyN `-tag model for the language-gated curation queries
  * (x26/x41/x44) — Caesar copies would fail the English gate and
  * shrink the curated layer back to 1× (PLANS.md:231-235).
  */
object Scale10Gen {
  private val Copies = 10
  private val Offset = 100000000L

  private def shiftKeys(df: DataFrame, keys: Seq[String], c: Int): DataFrame =
    keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(c * Offset)))

  private def copies(df: DataFrame)(one: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until Copies).map(c => one(df, c)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/scale10"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    def caesar(c: Int): (String, String) = {
      val l = lower.drop(c) + lower.take(c)
      (lower + upper, l + l.toUpperCase)
    }

    // events.parquet is TIMESTAMP(NANOS) — readable only through
    // graft.Tables (ns→µs in-plan); the scaled copy is written back as
    // regular µs timestamps, which Tables.events passes through
    def read(t: String) =
      if (t == "events") graft.Tables.events(spark, src)
      else spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, dir: String, t: String): Unit =
      df.coalesce(8).write.mode("overwrite").parquet(s"$out/$dir/$t.parquet")

    // dims: unscaled
    Seq("region", "nation").foreach(t => write(read(t), "dirA", t))

    // facts: key-shifted copies (keys consistent within a copy)
    val factKeys = Map(
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part"     -> Seq("p_partkey"),
      "orders"   -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events"   -> Seq("event_id", "user_id"))
    factKeys.foreach { case (t, keys) =>
      write(copies(read(t))((d, c) => shiftKeys(d, keys, c)), "dirA", t)
    }

    // documents, Caesar model: copy c shifts the alphabet by c — zero
    // cross-copy shingle overlap, so pair density grows linearly
    write(copies(read("documents")) { (d, c) =>
      val (from, to) = caesar(c)
      shiftKeys(d, Seq("doc_id"), c).withColumn("text", translate(col("text"), from, to))
    }, "dirA", "documents")

    // embeddings: id-shifted copies (each vector gains 9 exact twins —
    // the regime the ANN recall gates already monitor at 1×)
    write(copies(read("embeddings"))((d, c) => shiftKeys(d, Seq("vec_id"), c)),
      "dirA", "embeddings")

    // dirB: the tag model for language-gated curation queries — text
    // survives the English gate, fingerprints stay copy-distinct
    write(copies(read("documents")) { (d, c) =>
      shiftKeys(d, Seq("doc_id"), c)
        .withColumn("text", concat(lit(s"copy$c "), col("text")))
        .withColumn("n_chars", col("n_chars") + lit(6L + (if (c >= 10) 1L else 0L)))
    }, "dirB", "documents")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "embeddings")
      .foreach(t => write(read(t), "dirB", t))

    spark.stop()
  }
}
