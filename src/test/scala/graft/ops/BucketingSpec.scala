package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing for co-located joins: two tables bucketed+sorted on the
  * join key with the same bucket count join WITHOUT a shuffle exchange —
  * the physical-design tool for repeated large-fact joins at 100 TB
  * (pay the shuffle once at write time, never again at read time).
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables has no shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket_").toString
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lines")
    val orders = spark.range(0, 1000).select(
      col("id").as("okey"), (col("id") % 7).as("status"))
    val lines = spark.range(0, 5000).select(
      (col("id") % 1000).as("okey"), (col("id") % 13).cast("double").as("qty"))
    orders.write.bucketBy(8, "okey").sortBy("okey")
      .option("path", s"$wh/bkt_orders").saveAsTable("bkt_orders")
    lines.write.bucketBy(8, "okey").sortBy("okey")
      .option("path", s"$wh/bkt_lines").saveAsTable("bkt_lines")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("bkt_lines")
        .join(spark.table("bkt_orders"), "okey")
        .groupBy("status").agg(sum("qty").as("total"))
      assert(joined.count() == 7)
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not re-shuffle either bucketed side; the only
      // allowed exchange is the one for the final groupBy("status")
      val shuffles = "Exchange hashpartitioning\\(okey".r
        .findAllIn(plan).length
      assert(shuffles == 0, s"unexpected join-side shuffle in plan:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lines")
    }
  }
}
