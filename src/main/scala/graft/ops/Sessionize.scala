package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization as pure window relational algebra: a session
  * break is `lag(ts)` further than the gap behind the current row, and
  * the session number is the running sum of break flags — two window
  * passes over ONE partitioning (user), then a per-session aggregate.
  *
  * This is the batch-relational twin of
  * `streaming.EventStream.sessionize` (flatMapGroupsWithState): same
  * semantics, declarative plan — Catalyst sorts each user's events once
  * and both windows plus the final aggregate reuse that exchange. At
  * 100 TB this is one shuffle on the user key; per-user data never
  * materializes outside the sort. `EventStreamSpec` pins the two
  * formulations equal on the same input.
  */
object Sessionize {

  /** One row per (user, session): n_events, duration_min, total_value
    * (exact integer-cent sum — see `Marts.centSum`). All time arithmetic
    * runs on exact integer MICROseconds (`unix_micros`), never truncated
    * seconds: sub-second timestamps would otherwise put gap comparisons
    * and durations on different values than an exact-epoch engine.
    */
  def sessionizeBatch(events: DataFrame, userCol: String, tsCol: String,
                      valueCol: String, gapMinutes: Long = 30): DataFrame = {
    // tie-safe without a tiebreak column: rows sharing a timestamp have a
    // zero lag-gap BETWEEN them in any order, so they always land in the
    // same session, and the session's membership/aggregates do not depend
    // on how the sort broke the tie
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol))
    val us = unix_micros(col(tsCol))
    val flagged = events
      .withColumn("__prev_us", lag(us, 1).over(byUser))
      .withColumn("__brk",
        when(col("__prev_us").isNull ||
          us - col("__prev_us") > gapMinutes * 60000000L, 1L).otherwise(0L))
      .withColumn("session_no", sum("__brk").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col(userCol), col("session_no"))
      .agg(
        count(lit(1)).as("n_events"),
        ((max(us) - min(us)) / 60000000.0).as("duration_min"),
        (Marts.centSum(col(valueCol)) / 100.0).as("total_value"))
  }
}
