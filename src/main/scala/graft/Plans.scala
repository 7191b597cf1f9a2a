package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints `explain("formatted")` for selected queries so
  * pushdown/pruning/join strategies can be inspected and tracked.
  * Usage: runMain graft.Plans [queryName ...] (default: a headline set).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_iot_clean", "q07_order_status_mart", "q20_pricing_summary",
        "q21_shipping_priority", "q22_revenue_by_nation", "x05_cosine_topk",
        "x20_cosine_ivf")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
