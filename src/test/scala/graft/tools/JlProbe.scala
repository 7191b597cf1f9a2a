package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** Stage decomposition for the JL ANN pair (x67/x68) at a given corpus
  * dir: separates the projection scan, the scored cross join, the
  * window top-k, and the exact-space rerank so the dominant term of the
  * pair's 100× cost (149.5/130.4s in the round-11 honest sweep) can be
  * attributed instead of guessed at.
  * Usage: Test/runMain graft.tools.JlProbe <dir>
  */
object JlProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def emb: DataFrame = spark.read.parquet(s"$dir/embeddings.parquet")
    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[jlprobe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }

    val n = emb.count()
    val buckets = math.max(1L, n / 40).toInt
    val pred = graft.ops.Sampling.hashBucket(col("vec_id"), buckets) === 0
    val nq = emb.filter(pred).count()
    println(s"[jlprobe] corpus=$n queries=$nq dim=64 r=16")

    val asD = col("embedding").cast("array<double>")
    time("scan")(emb.select(col("vec_id")))
    time("project16")(emb.select(col("vec_id"),
      Similarity.jlProject(asD, 64, 16).as("p")))
    val corpus = emb.select(col("vec_id").as("nid"),
      Similarity.jlProject(asD, 64, 16).as("nvec"))
    val queries = emb.filter(pred).select(col("vec_id").as("qid"),
      Similarity.jlProject(asD, 64, 16).as("qvec"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"),
        round(Similarity.cosine(col("qvec"), col("nvec")), 6).as("sim"))
    // the UNCACHED per-pair-projection shape — the hazard this probe
    // exists to demonstrate. Opt-in (second arg "all"): at the 2M-vector
    // corpus it runs ~1h on the scan's own split count
    if (args.length > 1 && args(1) == "all")
      time("scored_agg")(scored.groupBy("qid").agg(count(lit(1)), max("sim")))
    time("jl_topk_full")(Similarity.cosineTopKJl(
      emb, "vec_id", "embedding", pred, dim = 64, r = 16, k = 5))
    time("jl_rerank_full")(Similarity.cosineTopKJlRerank(
      emb, "vec_id", "embedding", pred, dim = 64, r = 16,
      shortlist = 100, k = 5))
    time("brute_exact")(Similarity.cosineTopK(
      emb, "vec_id", "embedding", pred, k = 5))
    spark.stop()
  }
}
