package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Explode, Marts, Top1PerGroup}

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

  /** Deterministic session collection derived from the driver's `events`
    * table. Every column is simple arithmetic on `event_id` so the DuckDB
    * oracle reproduces it textually — this is what lets the whole
    * final-module clean+mart path run under the hash-compare gate rather
    * than ScalaTest only. Shapes covered: ~0.1% inverted and ~28%
    * over-24h durations (P5 anomalies), NULL arrays (A8), 1-5-element
    * page/action arrays, 3-device rotation.
    */
  def sessionsFromEvents(events: DataFrame): DataFrame =
    events.select(
        col("event_id").as("session_id"),
        col("user_id"),
        col("ts").as("start_time"),
        (col("event_id") % 2000 - 2).cast("int").as("__dur"),
        when(col("event_id") % 7 === 0, lit(null).cast("array<string>"))
          .otherwise(slice(split(lit("home search product cart checkout"), " "),
            lit(1), (col("event_id") % 5 + 1).cast("int"))).as("pages_visited"),
        when(col("event_id") % 11 === 0, lit(null).cast("array<string>"))
          .otherwise(slice(split(lit("click scroll search purchase logout"), " "),
            lit(1), (col("event_id") % 4 + 1).cast("int"))).as("actions"),
        element_at(split(lit("mobile desktop tablet"), " "),
          (col("event_id") % 3 + 1).cast("int")).as("device"))
      .withColumn("end_time", expr("start_time + make_interval(0,0,0,0,0, __dur, 0)"))
      .drop("__dur")

  /** Deterministic support-ticket collection derived from `orders` —
    * same oracle-replicable design as `sessionsFromEvents`. ~3% of rows
    * have updated_at < created_at (P6 anomalies); messages arrays are
    * NULL ~9% (A8); statuses rotate through all four FILTER-agg targets.
    */
  def ticketsFromOrders(orders: DataFrame): DataFrame =
    orders.select(
        col("o_orderkey").as("ticket_id"),
        col("o_custkey").as("user_id"),
        element_at(split(lit("open closed pending resolved"), " "),
          (col("o_orderkey") % 4 + 1).cast("int")).as("status"),
        element_at(split(lit("billing technical account delivery"), " "),
          (expr("o_orderkey div 4") % 4 + 1).cast("int")).as("issue_type"),
        when(col("o_orderkey") % 11 === 0, lit(null).cast("array<string>"))
          .otherwise(slice(split(lit("m1 m2 m3 m4 m5"), " "),
            lit(1), (col("o_orderkey") % 5 + 1).cast("int"))).as("messages"),
        col("o_orderdate").as("created_at"))
      .withColumn("updated_at",
        expr("created_at + make_interval(0,0,0,0, CAST(ticket_id % 100 - 3 AS INT), 0, 0)"))

  /** Deterministic event-log collection (nested details struct with a
    * null-able inner extra struct) derived from `events` — lets the P9
    * null-safe struct traversal and P7 null-timestamp filter run under
    * the oracle gate. ~10% null timestamps; `extra` present on ~20%.
    */
  def eventLogsFromEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      when(col("event_id") % 10 === 0, lit(null).cast("timestamp"))
        .otherwise(col("ts")).as("timestamp"),
      col("event_type"),
      struct(
        concat(lit("/page/"), col("event_id") % 20).as("page"),
        col("user_id").cast("string").as("user_id"),
        when(col("event_id") % 5 === 0,
            struct((col("event_id") % 7 + 500).cast("int").as("error_code")))
          .otherwise(lit(null)).as("extra")).as("details"))

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
    // averages in exact integer cents (duration_min and the counts are
    // 2-dp/-integral), so results are bit-identical across engines and
    // partitionings — see Marts.centAvg
    val stats = withMonth.groupBy(keys.map(col): _*).agg(
        count(lit(1)).as("sessions_count"),
        Marts.centSum(col("duration_min")).as("__dur_cents"),
        count(col("duration_min")).as("__dur_n"),
        sum("num_pages").as("total_pages"),
        sum(col("num_actions").cast("long") * 100).as("__act_cents"),
        count(col("num_actions")).as("__act_n"))
      .select(
        col("user_id"), col("report_month"), col("sessions_count"),
        (col("__dur_cents") / 100.0).as("total_duration_min"),
        Marts.centAvg(col("__dur_cents"), col("__dur_n")).as("avg_duration_min"),
        col("total_pages"),
        Marts.centAvg(col("__act_cents"), col("__act_n")).as("avg_actions"))
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
        // tie-proof cent averages (see Marts.centAvg); min/max of 2-dp
        // values round losslessly so stay as-is
        Marts.centSum(col("resolution_hours")).as("__res_cents"),
        count(col("resolution_hours")).as("__res_n"),
        round(min("resolution_hours"), 2).as("min_resolution_hours"),
        round(max("resolution_hours"), 2).as("max_resolution_hours"),
        sum(col("message_count").cast("long") * 100).as("__msg_cents"),
        count(col("message_count")).as("__msg_n"))
      .withColumn("avg_resolution_hours", Marts.centAvg(col("__res_cents"), col("__res_n")))
      .withColumn("avg_messages", Marts.centAvg(col("__msg_cents"), col("__msg_n")))
      .select("report_month", "issue_type", "tickets_count", "open_count",
        "closed_count", "pending_count", "resolved_count",
        "avg_resolution_hours", "min_resolution_hours",
        "max_resolution_hours", "avg_messages")
      .orderBy("report_month", "issue_type")

  /** A9 validation stage: fail fast if any layer is empty. */
  def validate(dfs: Map[String, DataFrame]): Unit =
    dfs.foreach { case (name, df) =>
      require(!df.isEmpty, s"validation failed: $name is empty")
    }
}
