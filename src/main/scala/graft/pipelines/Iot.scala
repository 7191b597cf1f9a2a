package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Cleaning, Percentiles, TopK}

/** The flagship HW-3 pipeline re-expressed Spark-first (SURVEY.md §3.1):
  * raw scan → typed clean → exact p5/p95 outlier filter → daily average →
  * ranked top-5 extremes. The `events` table stands in for the IoT
  * readings (ts → day, value → temp; FIXTURES.md §B).
  *
  * Reference: `HW-3/airflow/dags/iot_temperature.py:39-100` — one SQL
  * script with CTEs `base` (clean) and `p` (percentiles), then three
  * INSERT stages. Here the whole thing is ONE Catalyst lineage: the
  * scan/filter/projection fuse into a single codegen stage, the percentile
  * reduces to one broadcast row, the daily agg is one hash shuffle, and
  * top-5 is TakeOrderedAndProject — four stages total at any data size.
  */
object Iot {

  /** Clean + percentile-banded readings (base ∩ [p05, p95]). */
  def cleanBanded(events: DataFrame): DataFrame =
    Percentiles.filterWithinPercentiles(
      Cleaning.cleanEvents(events).select(col("event_id"), col("day"), col("value")),
      "value")

  /** Daily average over the banded readings (A2). Exact integer-cent
    * math end-to-end (sum of longs is associative, HALF_UP via
    * `floor(cents/n + 0.5)`), so the result is bit-identical across
    * engines and partition orders — `round(avg(double), 2)` instead
    * diverges on exact x.xx5 averages (SURVEY.md §7.4 trap 6).
    */
  def dailyAvg(events: DataFrame): DataFrame =
    cleanBanded(events)
      .groupBy("day")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("__cents"))
      .select(col("day"),
        (floor(col("__cents") / col("n") + 0.5) / 100.0).as("avg_value"),
        col("n"))

  /** Top-5 hottest days with rank (W1/T1). */
  def top5Hot(events: DataFrame): DataFrame =
    TopK.topK(dailyAvg(events), 5, col("avg_value").desc, col("day").asc)

  /** Top-5 coldest days with rank. */
  def top5Cold(events: DataFrame): DataFrame =
    TopK.topK(dailyAvg(events), 5, col("avg_value").asc, col("day").asc)

  /** Flagship entry for the driver smoke check (sf0.001). */
  def flagship(spark: SparkSession, sfDir: String): DataFrame =
    top5Hot(Tables.events(spark, sfDir))
}
