package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join scale technique: both fact tables are
  * written pre-hashed into the same number of buckets on the join key,
  * so the join consumes the on-disk layout and runs with ZERO exchanges
  * — at 100 TB this is the difference between an all-to-all network
  * shuffle of the fact table per query and none. This spec proves the
  * property structurally: same join, bucketed vs plain, identical rows,
  * and the bucketed physical plan contains no Exchange node.
  */
class BucketingSpec extends SparkSpec {

  test("pre-bucketed fact tables join with zero exchanges") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucket_wh").toString
    val orders = graft.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val lineitem = graft.Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_quantity")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")
    // force a sort-merge join (broadcast would hide the exchange
    // question) and keep AQE from wrapping the plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan
      val exchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      // the join itself must be exchange-free; the only shuffle allowed
      // is the final single-column aggregate
      val joinSubtree = plan.collectFirst {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }.getOrElse(fail(s"no sort-merge join in:\n$plan"))
      val joinExchanges = joinSubtree.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(joinExchanges.isEmpty,
        s"bucketed join still shuffles (${joinExchanges.length} exchanges):\n$plan")
      assert(exchanges.length <= 1, s"unexpected exchanges:\n$plan")
      // and the result matches the plain (shuffling) join
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      assert(joined.collect().toSet == plain.collect().toSet)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
