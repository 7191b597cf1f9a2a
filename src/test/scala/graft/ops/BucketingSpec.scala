package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing for co-located joins: two tables bucketed+sorted on the
  * join key with the same bucket count join WITHOUT a shuffle exchange —
  * the physical-design tool for repeated large-fact joins at 100 TB
  * (pay the shuffle once at write time, never again at read time).
  * Asserts structurally on the sort-merge-join subtree (not a plan-string
  * regex) over the real testdata tables, and pins result parity with the
  * plain shuffling join.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables has no shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket_wh").toString
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    val orders = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val lineitem = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/bkt_orders").saveAsTable("bkt_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/bkt_lineitem").saveAsTable("bkt_lineitem")
    // force a sort-merge join (broadcast would hide the exchange
    // question) and keep AQE from wrapping the plan tree; save BOTH
    // prior values — restoring a hardcoded default would leak state into
    // sibling specs sharing the session
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan
      val joinSubtree = plan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.getOrElse(fail(s"no sort-merge join in:\n$plan"))
      val joinExchanges = joinSubtree.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(joinExchanges.isEmpty,
        s"bucketed join still shuffles (${joinExchanges.length} exchanges):\n$plan")
      // the only exchange in the whole plan is the final 1-column groupBy
      val allExchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(allExchanges.length <= 1, s"unexpected exchanges:\n$plan")
      // and the result matches the plain (shuffling) join
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(joined.collect().toSet == plain.collect().toSet)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }
}
