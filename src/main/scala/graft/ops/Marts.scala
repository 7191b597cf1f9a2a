package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Analytical-mart builders: multi-metric grouped aggs, conditional
  * (FILTER) aggregates, month truncation, and the 3-way left join of a
  * stats CTE with top-1-per-group dimensions.
  *
  * Reference:
  *  - A3 session_stats: `final-module-3/airflow/dags/build_analytical_marts.py:31-40`
  *  - A4/A5 support-efficiency FILTER aggs: `build_analytical_marts.py:98-127`
  *  - J2 multi-key left joins: `build_analytical_marts.py:86-91`
  *  - F8 `DATE_TRUNC('month', d)::date`: `build_analytical_marts.py:32`
  *
  * Scale design: each groupBy is one hash shuffle with map-side partial
  * aggregation; the joins key on the same (user, month) grouping columns so
  * Catalyst/AQE reuses the exchange or broadcasts the smaller aggregated
  * sides. Conditional aggregates are `sum(when(...))` — codegen'd, no UDF.
  */
object Marts {

  /** Per-user activity stats over `events` (stands in for session_stats):
    * event count, total/avg value, active-day count.
    *
    * Money math runs in exact integer cents: the source values are 2-dp,
    * so `round(value*100)` is never near a tie, the cent sum is exact,
    * and the HALF_UP average is `floor(cents/n + 0.5)` — every step is
    * bit-identical across engines. (`round(avg(..), 2)` instead hits
    * exact `x.xx5` averages where Spark's decimal-string HALF_UP and the
    * oracle's binary rounding disagree — observed 4/1500 rows at sf0.1.)
    */
  def userActivityStats(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("__cents"),
        countDistinct("day").as("n_active_days"))
      .select(
        col("user_id"), col("n_events"),
        (col("__cents") / 100.0).as("total_value"),
        (floor(col("__cents") / col("n_events") + 0.5) / 100.0).as("avg_value"),
        col("n_active_days"))

  /** User-activity mart: stats ⟕ top event_type per user (A3 + A6 + J2). */
  def userActivityMart(events: DataFrame): DataFrame = {
    val stats = userActivityStats(events)
    val topType = Top1PerGroup.top1(events, Seq("user_id"), "event_type")
      .withColumnRenamed("event_type", "top_event_type")
      .withColumnRenamed("cnt", "top_event_cnt")
    stats.join(topType, Seq("user_id"), "left")
  }

  /** Support-efficiency-style mart on `orders`: per month, status-filtered
    * counts + rounded price stats (A4/A5/F8/F10).
    */
  def orderStatusMart(orders: DataFrame): DataFrame =
    orders
      .select(
        date_trunc("month", col("o_orderdate")).cast("date").as("order_month"),
        col("o_orderstatus"), col("o_totalprice"))
      .groupBy("order_month")
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_open"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_filled"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_pending"),
        // integer-cent average (tie-proof across engines, like q06);
        // min/max of 2-dp values round losslessly so stay as-is
        count(col("o_totalprice")).as("__vals"),
        sum(round(col("o_totalprice") * 100, 0).cast("long")).as("__cents"),
        round(min("o_totalprice"), 2).as("min_price"),
        round(max("o_totalprice"), 2).as("max_price"))
      .withColumn("avg_price",
        floor(col("__cents") / col("__vals") + 0.5) / 100.0)
      .select("order_month", "n_orders", "n_open", "n_filled", "n_pending",
        "avg_price", "min_price", "max_price")
}
