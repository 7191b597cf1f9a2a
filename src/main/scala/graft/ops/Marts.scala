package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Tie-proof HALF_UP money average from an exact integer-cent sum:
    * `floor(cents/n + 0.5)/100` — bit-identical across engines and
    * partitionings, unlike `round(avg(double), 2)` which diverges on
    * exact x.xx5 averages (the canonical idiom; use for every mart
    * money average).
    */
  private[graft] def centAvg(cents: Column, n: Column): Column =
    floor(cents / n + 0.5) / 100.0

  /** Exact integer-cent sum of a 2-dp double column. */
  private[graft] def centSum(c: Column): Column =
    sum(round(c * 100, 0).cast("long"))

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
        centSum(col("value")).as("__cents"),
        countDistinct("day").as("n_active_days"))
      .select(
        col("user_id"), col("n_events"),
        (col("__cents") / 100.0).as("total_value"),
        centAvg(col("__cents"), col("n_events")).as("avg_value"),
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
        // min/max of 2-dp values round losslessly so stay as-is
        count(col("o_totalprice")).as("__vals"),
        centSum(col("o_totalprice")).as("__cents"),
        round(min("o_totalprice"), 2).as("min_price"),
        round(max("o_totalprice"), 2).as("max_price"))
      .withColumn("avg_price", centAvg(col("__cents"), col("__vals")))
      .select("order_month", "n_orders", "n_open", "n_filled", "n_pending",
        "avg_price", "min_price", "max_price")
}
