package graft

import org.apache.spark.sql.functions._

/** Spark 4 runtime bloom-filter join pruning: a selective filter on one
  * join side is turned into a bloom filter applied on the OTHER side's
  * scan, so the big side drops non-joining rows before the shuffle — at
  * 100 TB this is the difference between shuffling the whole fact table
  * and shuffling only the slice that can match. Production thresholds
  * (10 GB application side) never fire on test data, so this pins the
  * mechanism with thresholds scaled down.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective join side injects a bloom filter into the big side's scan") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val orders = Tables.orders(spark, sfDir)
        .filter(col("o_orderstatus") === "P") // selective creation side
      val lineitem = Tables.lineitem(spark, sfDir)
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected in:\n$optimized")
      // sanity: the filtered join still returns the right count
      val expected = lineitem.join(
          Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "P"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.collect()(0).getLong(0) == expected)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
