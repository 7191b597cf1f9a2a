package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (last-N-days) recompute with upsert/merge semantics.
  *
  * Reference (SURVEY.md §2.10, P8/K4/K5): `HW-4/airflow/dags/
  * iot_temperature.py:108-245` — daily trigger recomputes only
  * `day >= today - 7`, deletes the window (`:160-161`), re-inserts, and
  * upserts the daily aggregate (`ON CONFLICT (day) DO UPDATE`, `:207-216`).
  *
  * Scale design: the cutoff predicate is partition-prunable — on a
  * `day`-partitioned 100 TB table only the last-N-days partitions are read
  * and rewritten (`partitionOverwriteMode=dynamic`); the untouched history
  * is never scanned. The cutoff itself is derived IN-plan from `max(day)`
  * (broadcast 1-row cross join), so no driver-side collect and the job is
  * deterministic given its input (oracle-checkable, unlike `current_date`).
  */
object Incremental {

  /** Attach `cutoff = max(day) - (windowDays-1)` to every row in-plan. */
  def withCutoff(df: DataFrame, dayCol: String, windowDays: Int): DataFrame = {
    val mx = df.agg(date_sub(max(col(dayCol)), windowDays - 1).as("cutoff"))
    df.crossJoin(broadcast(mx))
  }

  /** Daily aggregate restricted to the recompute window (P8 + A2).
    * Integer-cent averaging for cross-engine determinism (see
    * `pipelines.Iot.dailyAvg`).
    */
  def incrementalDailyAvg(events: DataFrame, windowDays: Int): DataFrame = {
    val byDay = events.select(to_date(col("ts")).as("day"), col("value"))
    withCutoff(byDay, "day", windowDays)
      .filter(col("day") >= col("cutoff"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"),
        // avg must ignore nulls like plain avg(value) → non-null denominator
        count(col("value")).as("__vals"),
        sum(round(col("value") * 100, 0).cast("long")).as("__cents"))
      .select(col("day"),
        (floor(col("__cents") / col("__vals") + 0.5) / 100.0).as("avg_value"),
        col("n"))
  }

  /** Upsert-as-recompute (K4/K5): keep `existing` rows outside the window,
    * replace the window with freshly recomputed `incoming`. With both sides
    * keyed on `day`, this is exactly the reference's delete-then-insert.
    * Property: merge(full-history-agg, window-agg) ≡ full recompute.
    */
  def mergeWindow(existing: DataFrame, incoming: DataFrame, dayCol: String,
                  cutoffExpr: DataFrame): DataFrame = {
    val keep = existing.crossJoin(broadcast(cutoffExpr))
      .filter(col(dayCol) < col("cutoff")).drop("cutoff")
    keep.unionByName(incoming)
  }

  /** K4 generalized: arbitrary-key upsert. Incoming rows win; existing
    * rows survive only where no incoming row shares their key — exactly
    * `INSERT ... ON CONFLICT (keys) DO UPDATE` over whole rows
    * (`HW-4/airflow/dags/iot_temperature.py:207-216`, lifted from the
    * day column to any key set). One anti-join shuffle + a union; at
    * scale both sides hash-partition on the same keys so AQE can plan
    * the anti join without an extra exchange.
    *
    * Multiset on the incoming side: duplicate-keyed incoming rows are ALL
    * kept (only existing rows are pruned). A sink that promises
    * one-row-per-key must dedup the batch first — `Sinks.upsertReload`
    * does.
    */
  def upsertByKey(existing: DataFrame, incoming: DataFrame,
                  keys: Seq[String]): DataFrame =
    incoming.unionByName(existing.join(incoming, keys, "left_anti"))
}
