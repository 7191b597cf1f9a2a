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

  /** Gap-based sessionization with `flatMapGroupsWithState` — the
    * custom-state slot the reference's session analytics would need in
    * streaming form (session_stats, `final-module-3/.../
    * build_analytical_marts.py:31-40`).
    *
    * Emits CLOSED sessions only (Append): a session closes when a later
    * event exceeds `gapMinutes`, or — for idle users — when the event-time
    * watermark passes `last + gap` (`EventTimeTimeout` +
    * `setTimeoutTimestamp`), which also REMOVES the user's state. State is
    * therefore bounded by the number of currently-active users, not by
    * history — the NoTimeout variant instead grows the state store
    * without bound and never emits idle sessions. On batch inputs (oracle
    * parity) each group sees all its data once and trailing open sessions
    * are flushed at the end.
    *
    * The per-invocation sort is bounded by ONE user's ONE-trigger batch
    * (not full history — state carries only the open-session aggregate).
    */
  def sessionize(spark: SparkSession, events: Dataset[SessionIn],
                 gapMinutes: Long = 30,
                 lateness: String = "10 minutes"): Dataset[SessionOut] = {
    import spark.implicits._
    val streaming = events.isStreaming
    val src = if (streaming) events.withWatermark("ts", lateness) else events
    // exact MICROsecond arithmetic, matching ops.Sessionize.sessionizeBatch
    // bit-for-bit — ms truncation (ts.getTime) would place gap breaks
    // differently on sub-millisecond timestamps
    val gapUs = gapMinutes * 60000000L
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
    def out(user: Long, s: SessionState) =
      SessionOut(user, s.nEvents, (s.last - s.start) / 60000000.0, s.total)
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout // batch: timeouts can never fire
    src.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeoutConf) {
        (user: Long, rows: Iterator[SessionIn], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(out(user, s))
          } else {
            val sorted = rows.toArray.sortBy(e => micros(e.ts))
            val closed = List.newBuilder[SessionOut]
            var open = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              open match {
                case Some(s) if t - s.last > gapUs =>
                  closed += out(user, s) // gap exceeded → close, start new
                  open = Some(SessionState(t, t, 1L, e.value))
                case Some(s) =>
                  open = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.nEvents + 1, s.total + e.value))
                case None =>
                  open = Some(SessionState(t, t, 1L, e.value))
              }
            }
            if (!streaming) {
              // bounded input: the trailing open session is complete
              closed ++= open.map(out(user, _))
            } else {
              open.foreach { s =>
                state.update(s)
                // timeout API is millis: round UP so the timeout never
                // fires early; never set it behind the watermark (Spark
                // rejects that) — a very-late session then closes one
                // trigger later
                val timeoutMs = Math.floorDiv(s.last + gapUs + 999L, 1000L)
                state.setTimeoutTimestamp(
                  math.max(timeoutMs, state.getCurrentWatermarkMs + 1))
              }
            }
            closed.result().iterator
          }
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

  /** The reference's upsert sink (K4, `HW-4/.../iot_temperature.py:
    * 207-216`) in continuous form: every micro-batch merges into the
    * parquet target by key via `foreachBatch` — the streaming slot for
    * read-modify-write sinks that plain appends cannot express. The
    * checkpoint makes re-delivered batches idempotent: re-upserting the
    * same rows is a no-op by construction.
    */
  def startUpsertSink(df: DataFrame, keys: Seq[String], path: String,
                      checkpoint: String) =
    df.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.Sinks.upsertReload(batch, path, keys)
      }
      .start()
}
