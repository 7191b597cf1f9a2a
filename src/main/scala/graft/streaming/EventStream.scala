package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming expression of the reference's incremental
  * pipeline (SURVEY.md §2.10): the HW-4 daily-trigger, last-N-days
  * recompute (`HW-4/airflow/dags/iot_temperature.py:108-245`) is exactly
  * what a watermarked streaming aggregation does continuously — late data
  * within the watermark updates its day bucket, older data is dropped.
  *
  * The transforms are `DataFrame → DataFrame` and work on BOTH batch and
  * streaming inputs (the unified Dataset API), so the batch oracle checks
  * the same logic the stream runs. State stores are keyed by (day) /
  * (user) — partitioned, bounded by watermark eviction: safe at
  * arbitrary input rates.
  */
object EventStream {

  /** Watermarked daily average of `value` — the continuous version of the
    * iot_daily aggregate (A2 + P8). Late events beyond `lateness` are
    * dropped instead of re-running a 7-day recompute window.
    */
  def dailyAvgStream(events: DataFrame, lateness: String = "2 days"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 day").as("w"))
      // same integer-cent averaging as batch Iot.dailyAvg, so batch and
      // stream agree bit-for-bit (module contract)
      .agg(count(lit(1)).as("n"),
        count(col("value")).as("__vals"),
        sum(round(col("value") * 100, 0).cast("long")).as("__cents"))
      .select(to_date(col("w.start")).as("day"),
        (floor(col("__cents") / col("__vals") + 0.5) / 100.0).as("avg_value"),
        col("n"))

  case class SessionIn(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, nEvents: Long, total: Double)
  case class SessionOut(user_id: Long, n_events: Long, duration_min: Double,
                        total_value: Double)

  /** Gap-based sessionization with `mapGroupsWithState` — the custom-state
    * slot the reference's session analytics would need in streaming form
    * (session_stats, `final-module-3/.../build_analytical_marts.py:31-40`).
    * Emits the CURRENT session aggregate per user on every trigger; an
    * event arriving more than `gapMinutes` after the previous one starts
    * a new session (production would add an event-time timeout to close
    * and emit idle sessions — omitted here to keep triggers data-driven).
    */
  def sessionize(spark: SparkSession, events: Dataset[SessionIn],
                 gapMinutes: Long = 30): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, SessionOut](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[SessionIn], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var s = state.getOption.getOrElse(SessionState(Long.MaxValue, 0L, 0L, 0.0))
          sorted.foreach { e =>
            val t = e.ts.getTime
            s =
              if (s.nEvents > 0 && t - s.last > gapMinutes * 60000L)
                SessionState(t, t, 1L, e.value) // gap exceeded → new session
              else
                SessionState(math.min(s.start, t), math.max(s.last, t),
                  s.nEvents + 1, s.total + e.value)
          }
          state.update(s)
          SessionOut(user, s.nEvents, (s.last - s.start) / 60000.0, s.total)
      }
  }

  /** Streaming keep-first dedup — the continuous form of the reference's
    * `ON CONFLICT DO NOTHING` replication (K3/S6): duplicate keys within
    * the watermark are dropped exactly once; watermark eviction bounds
    * the dedup state store, so it runs forever at any rate.
    */
  def dedupStream(events: DataFrame, keyCol: String,
                  lateness: String = "1 hour"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(keyCol)
    else
      // batch equivalence (module contract): watermark-window dedup over a
      // bounded input is plain key dedup
      events.dropDuplicates(keyCol)

  /** Wire a streaming daily aggregate to an in-memory sink (testing /
    * demo). Production swaps `format("memory")` for a parquet/Kafka sink
    * with a checkpoint location; the plan is identical.
    */
  def startDailyToMemory(df: DataFrame, queryName: String) =
    dailyAvgStream(df)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(OutputMode.Update())
      .start()
}
