package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Headline relational analytics over the star schema — the queries that
  * exercise scan → filter → join → agg → sort at bench scale.
  *
  * These go beyond the reference's own operator list only in data volume;
  * every operator they use (grouped agg, equi join, top-k) is in
  * SURVEY.md §2. Money sums are done in DECIMAL(18,2) on both engines so
  * the oracle hash-compare is exact (double summation order differs
  * between Spark partial aggregates and DuckDB; decimal sums don't —
  * SURVEY.md §7.4 trap 6).
  *
  * Scale design: dimension tables (region/nation/supplier/customer at
  * TPC-H ratios) are broadcast — the fact-table scan never shuffles for
  * them; only the final groupBy exchanges data, after map-side partial
  * aggregation. Filters sit directly on scan columns so they push into
  * the parquet reader.
  */
object Analytics {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Exact discounted revenue: the source doubles hold exactly-2-decimal
    * values, so a scale-2 decimal cast is never near a rounding tie; the
    * multiply then happens in exact decimal arithmetic. (Casting the
    * double PRODUCT to decimal instead hits .xx5 ties where Spark and
    * DuckDB round differently — measured 0.16 drift over 112k rows.)
    */
  private def discRevenue: Column =
    dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))

  /** TPC-H Q1-style pricing summary: per (returnflag, linestatus). */
  def pricingSummary(lineitem: DataFrame, shipBefore: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") < lit(shipBefore).cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).as("sum_base_price"),
        sum(discRevenue).as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style shipping priority: top-10 open orders by revenue for
    * one market segment. Customer side broadcast; top-k via
    * TakeOrderedAndProject with full tiebreaks.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                       segment: String, cutoff: String): DataFrame = {
    // customer/orders are NOT broadcast: at 100 TB both sides are large —
    // these are shuffle joins on the key, and AQE converts to broadcast at
    // runtime when a filtered side turns out small.
    val c = customer.filter(col("c_mktsegment") === segment).select("c_custkey")
    val o = orders.filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = lineitem.filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(o.join(c, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"))
      .agg(sum(discRevenue).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-style revenue by nation for one region/year: the full
    * broadcast-dimension join chain down to lineitem.
    */
  def revenueByNation(region: DataFrame, nation: DataFrame, customer: DataFrame,
                      orders: DataFrame, lineitem: DataFrame,
                      regionName: String, yearStart: String, yearEnd: String): DataFrame = {
    // region/nation are O(10²) rows at any SF → broadcast; customer/orders
    // scale with the data → shuffle joins (AQE may still broadcast them).
    val n = nation.join(broadcast(region.filter(col("r_name") === regionName)),
      col("n_regionkey") === col("r_regionkey"))
    val c = customer.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val o = orders
      .filter(col("o_orderdate") >= lit(yearStart).cast("timestamp") &&
        col("o_orderdate") < lit(yearEnd).cast("timestamp"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("n_name"))
    lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("n_name")
      .agg(sum(discRevenue).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }
}
