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
    * event count, total/avg value (rounded at the mart edge per
    * SURVEY.md §7.4 trap 6), active-day count.
    */
  def userActivityStats(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"),
        round(avg("value"), 2).as("avg_value"),
        countDistinct("day").as("n_active_days"))

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
        round(avg("o_totalprice"), 2).as("avg_price"),
        round(min("o_totalprice"), 2).as("min_price"),
        round(max("o_totalprice"), 2).as("max_price"))
}
