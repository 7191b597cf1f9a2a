package graft.tools

import org.apache.spark.sql.SparkSession

/** Matched flat-vs-hier kNN-graph probe (x63's operator) for the
  * PLANS.md scale tables: times `Similarity.knnGraphInt` (the flat
  * n·nlist crossJoin spelling at x63's PRE-round-11 √(n/2) schedule)
  * against `Similarity.knnGraphIntHier` (the shipped two-level
  * spelling at the knnHierClusterSize=100 schedule) on the same
  * corpus, same JVM, noop-sink materialization, warm-up on sf0.001 —
  * the isolated-matched protocol the bench memory requires for
  * per-query scale conclusions.
  *
  * usage: Test/runMain graft.tools.KnnProbe <sfDir> <flat|hier|both> [reps]
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions.col
    import graft.sim.Similarity
    import graft.multimodal.Multimodal

    def graph(d: String, hier: Boolean) = {
      val docs = graft.Tables.documents(spark, d)
      val emb = Multimodal.fakeEmbedInt(spark,
        Multimodal.withPayload(docs, "doc_id", "text"), dim = 16)
        .toDF().cache()
      val n = docs.count()
      if (hier) {
        val nlist = math.max(16L, math.ceil(n / 100.0).toLong).toInt
        val ncoarse = math.max(4L, math.ceil(math.sqrt(nlist.toDouble)).toLong).toInt
        Similarity.knnGraphIntHier(emb, "doc_id", "embedding",
          nlist = nlist, ncoarse = ncoarse, nprobe = 2, k = 5)
      } else {
        val nlist = math.max(16L, math.ceil(math.sqrt(n / 2.0)).toLong).toInt
        Similarity.knnGraphInt(emb, "doc_id", "embedding",
          nlist = nlist, nprobe = 2, k = 5)
      }
    }
    def run(hier: Boolean): Unit = {
      val label = if (hier) "hier" else "flat"
      // warm-up: codegen + parquet footers on the tiny dir
      graph("/root/testdata/sf0.001", hier)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      val times = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        graph(dir, hier).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        System.err.println(f"[knnprobe] $label rep $r: $dt%.1fs")
        dt
      }
      println(f"[knnprobe] RESULT $label $dir min=${times.min}%.2fs reps=$reps")
    }
    if (mode == "flat" || mode == "both") run(hier = false)
    if (mode == "hier" || mode == "both") run(hier = true)
    spark.stop()
  }
}
