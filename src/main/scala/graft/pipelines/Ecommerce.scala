package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Explode, Top1PerGroup}

/** The final-module pipeline end-to-end (SURVEY.md §3.2/§3.3):
  * document collections → raw (dedup) → clean (derived columns + anomaly
  * filters) → two analytical marts.
  *
  * Reference: `final-module-3/airflow/dags/mongo_to_postgres_replication
  * .py` (raw + clean) and `build_analytical_marts.py` (marts). The
  * per-row worker loops disappear; every step is columnar and the whole
  * path is one Catalyst lineage per mart.
  *
  * Scale notes: dedup is one shuffle on the collection key; the clean
  * layer is map-only; each mart costs one groupBy shuffle per aggregate
  * plus joins keyed on the SAME (user, month) grouping columns — the
  * exchanges line up, so Catalyst reuses partitioning instead of
  * re-shuffling between the stats and top-1 subtrees.
  */
object Ecommerce {

  /** raw → clean user_sessions: deterministic keep-first dedup (A7),
    * temporal sanity filter (P5: start < end < start+24h), derived
    * duration/num_pages/num_actions/session_date (P10, F9, A8, F6) —
    * `mongo_to_postgres_replication.py:221-236`.
    */
  def cleanSessions(raw: DataFrame): DataFrame =
    Dedup.keepFirst(raw, Seq("session_id"), Seq(col("start_time").asc, col("end_time").asc))
      .filter(col("start_time") < col("end_time") &&
        col("end_time") < col("start_time") + expr("INTERVAL 24 HOURS"))
      .select(
        col("session_id"), col("user_id"), col("start_time"), col("end_time"),
        round((unix_timestamp(col("end_time")) - unix_timestamp(col("start_time"))) / 60.0, 2)
          .as("duration_min"),
        Explode.sizeOrZero(col("pages_visited")).as("num_pages"),
        Explode.sizeOrZero(col("actions")).as("num_actions"),
        col("device"), col("pages_visited"), col("actions"),
        to_date(col("start_time")).as("session_date"))

  /** raw → clean event_logs: dedup + null-safe nested unwrap (P9) +
    * null-timestamp filter (P7) — `mongo_to_postgres_replication.py:77-97,251`.
    */
  def cleanEventLogs(raw: DataFrame): DataFrame =
    Dedup.keepFirst(raw, Seq("event_id"), Seq(col("timestamp").asc))
      .filter(col("timestamp").isNotNull)
      .select(
        col("event_id"), col("timestamp"), col("event_type"),
        col("details.page").as("page"),
        col("details.user_id").as("user_id"),
        col("details.extra.error_code").as("error_code"),
        to_date(col("timestamp")).as("event_date"))

  /** raw → clean support_tickets: ordering sanity filter (P6) +
    * resolution hours (F9) + message count (A8) —
    * `mongo_to_postgres_replication.py:254-269`.
    */
  def cleanTickets(raw: DataFrame): DataFrame =
    raw.filter(col("created_at") <= col("updated_at"))
      .select(
        col("ticket_id"), col("user_id"), col("status"), col("issue_type"),
        Explode.sizeOrZero(col("messages")).as("message_count"),
        round((unix_timestamp(col("updated_at")) - unix_timestamp(col("created_at"))) / 3600.0, 2)
          .as("resolution_hours"),
        col("created_at"), col("updated_at"))

  /** mart_user_activity (§3.3): per (user, month) session stats (A3) left-
    * joined (J2) with the top device / top page / top action (A6; pages
    * and actions via explode J3).
    */
  def martUserActivity(cleanSessions: DataFrame): DataFrame = {
    val keys = Seq("user_id", "report_month")
    val withMonth = cleanSessions
      .withColumn("report_month", date_trunc("month", col("session_date")).cast("date"))
    val stats = withMonth.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("sessions_count"),
      round(sum("duration_min"), 2).as("total_duration_min"),
      round(avg("duration_min"), 2).as("avg_duration_min"),
      sum("num_pages").as("total_pages"),
      round(avg("num_actions"), 2).as("avg_actions"))
    def top1Of(dim: String, df: DataFrame, outName: String) =
      Top1PerGroup.top1(df, keys, dim)
        .withColumnRenamed(dim, outName).drop("cnt")
    val topDevice = top1Of("device", withMonth, "top_device")
    val topPage = top1Of("page_val",
      Explode.unnest(withMonth, col("pages_visited"), "page_val", keys.map(col): _*),
      "top_page")
    val topAction = top1Of("action_val",
      Explode.unnest(withMonth, col("actions"), "action_val", keys.map(col): _*),
      "top_action")
    stats
      .join(topDevice, keys, "left")
      .join(topPage, keys, "left")
      .join(topAction, keys, "left")
  }

  /** mart_support_efficiency (§3.3): per (month, issue_type) FILTER-agg
    * status counts (A4) + rounded resolution stats (A5), ordinal-sorted
    * (T3).
    */
  def martSupportEfficiency(cleanTickets: DataFrame): DataFrame =
    cleanTickets
      .withColumn("report_month", date_trunc("month", col("created_at")).cast("date"))
      .groupBy("report_month", "issue_type")
      .agg(
        count(lit(1)).as("tickets_count"),
        sum(when(col("status") === "open", 1).otherwise(0)).as("open_count"),
        sum(when(col("status") === "closed", 1).otherwise(0)).as("closed_count"),
        sum(when(col("status") === "pending", 1).otherwise(0)).as("pending_count"),
        sum(when(col("status") === "resolved", 1).otherwise(0)).as("resolved_count"),
        round(avg("resolution_hours"), 2).as("avg_resolution_hours"),
        round(min("resolution_hours"), 2).as("min_resolution_hours"),
        round(max("resolution_hours"), 2).as("max_resolution_hours"),
        round(avg("message_count"), 2).as("avg_messages"))
      .orderBy("report_month", "issue_type")

  /** A9 validation stage: fail fast if any layer is empty. */
  def validate(dfs: Map[String, DataFrame]): Unit =
    dfs.foreach { case (name, df) =>
      require(!df.isEmpty, s"validation failed: $name is empty")
    }
}
