package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact global percentile bounds + in-plan range filter.
  *
  * Reference: `percentile_cont(0.05/0.95) WITHIN GROUP (ORDER BY temp_num)`
  * over the whole input, then `temp BETWEEN p5 AND p95` via a cross join
  * against the 1-row aggregate (SURVEY.md A1/J1/P4;
  * `HW-3/airflow/dags/iot_temperature.py:64-72`).
  *
  * Scale design: Spark's exact `percentile` aggregate matches
  * `percentile_cont`'s linear interpolation. The 1-row bounds stay IN the
  * plan (crossJoin of a broadcast single row → BroadcastNestedLoopJoin);
  * never collected to the driver, so the same lineage works whether the
  * input is 60k rows or 100 TB. The percentile itself is the one genuinely
  * global operation — it reduces to one row, which is the minimum possible
  * shuffle for this semantics.
  */
object Percentiles {

  /** 1-row DataFrame with exact interpolated bounds `pLo`, `pHi`. */
  def bounds(df: DataFrame, valueCol: String, lo: Double, hi: Double): DataFrame =
    df.agg(
      percentile(col(valueCol), lit(lo)).as("p_lo"),
      percentile(col(valueCol), lit(hi)).as("p_hi"))

  /** Keep rows with `valueCol` within the exact [lo, hi] global
    * percentiles. Bounds are broadcast; filter happens map-side.
    */
  def filterWithinPercentiles(df: DataFrame, valueCol: String,
                              lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val b = bounds(df, valueCol, lo, hi)
    df.crossJoin(broadcast(b))
      .filter(col(valueCol).between(col("p_lo"), col("p_hi")))
      .drop("p_lo", "p_hi")
  }
}
