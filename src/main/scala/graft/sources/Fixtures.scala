package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-collection generator (S7/F18): reproduces the
  * SHAPE and golden cardinalities of the reference seed
  * (`final-module-3/airflow/dags/seed_mongo.py:108-250`, counts at
  * `:27-31`) without copying its data values. Unlike the reference's
  * unseeded `random`, every column derives from `hash(id, salt)` — fully
  * deterministic, fully distributed (`spark.range` + column expressions,
  * no driver-side loops), so the same fixture generates identically at
  * any scale or partition count.
  *
  * Golden counts (used as implicit test oracles, SURVEY.md §5):
  * 2000+50-dupe sessions, 5000+100-dupe events, 600 tickets, 200 recs,
  * 800 reviews; 200 users, 50 products.
  */
object Fixtures {

  private def pick(c: org.apache.spark.sql.Column, salt: Int, n: Int) =
    pmod(hash(c, lit(salt)), lit(n))

  private def userOf(c: org.apache.spark.sql.Column, salt: Int) =
    format_string("user_%04d", pick(c, salt, 200))

  private def productOf(c: org.apache.spark.sql.Column, salt: Int) =
    format_string("prod_%03d", pick(c, salt, 50))

  private val t0 = "TIMESTAMP '2024-01-01 00:00:00'"

  /** `n` distinct-ish vocabulary picks per row, deterministic from
    * hash(key, i, salt) — replaces a seeded shuffle (Spark's `shuffle`
    * only takes literal seeds and is partition-order-dependent).
    */
  private def pickSome(key: org.apache.spark.sql.Column, salt: Int,
                       vocab: String, n: org.apache.spark.sql.Column) = {
    val arr = split(lit(vocab), " ")
    val sz = vocab.split(" ").length
    // guard n = 0: Spark's sequence(1, 0) yields the DESCENDING [1, 0],
    // not an empty array
    when(n < 1, array().cast("array<string>")).otherwise(
      array_distinct(transform(sequence(lit(1), n),
        i => element_at(arr, (pmod(hash(key, i, lit(salt)), lit(sz)) + 1).cast("int")))))
  }

  /** 2000 sessions + 50 exact duplicates (dedup key `session_id`);
    * 1–120-minute durations; pages/actions arrays; ~2% anomalous rows
    * (start >= end) for the clean-layer filter (P5).
    */
  def userSessions(spark: SparkSession): DataFrame = {
    val base = spark.range(2000).select(
      format_string("sess_%05d", col("id")).as("session_id"),
      userOf(col("id"), 1).as("user_id"),
      expr(s"$t0 + make_interval(0,0,0,0,0,0, id * 3600 + pmod(hash(id, 2), 86400))")
        .as("start_time"),
      (pick(col("id"), 3, 120) + 1).as("dur_min"),
      pickSome(col("id"), 4, "home search product cart checkout profile help",
        pick(col("id"), 5, 4) + 1).as("pages_visited"),
      element_at(split(lit("mobile desktop tablet"), " "),
        (pick(col("id"), 6, 3) + 1).cast("int")).as("device"),
      pickSome(col("id"), 7, "click scroll search purchase logout",
        pick(col("id"), 8, 3) + 1).as("actions"))
      .withColumn("end_time",
        // ~2% anomalies: end before start (filtered in the clean layer)
        when(pick(col("session_id"), 9, 50) === 0,
          expr("start_time - make_interval(0,0,0,0,0, dur_min, 0)"))
        .otherwise(expr("start_time + make_interval(0,0,0,0,0, dur_min, 0)")))
      .drop("dur_min")
    base.unionByName(base.orderBy("session_id").limit(50)) // 50 exact dupes
  }

  /** 5000 events + 100 duplicates; nested details struct with ~70%-null
    * extra (FIXTURES.md §A4 event_logs).
    */
  def eventLogs(spark: SparkSession): DataFrame = {
    val base = spark.range(5000).select(
      format_string("evt_%05d", col("id")).as("event_id"),
      expr(s"$t0 + make_interval(0,0,0,0,0, id * 30 + pmod(hash(id, 11), 1440), 0)")
        .as("timestamp"),
      element_at(split(lit("page_view click error login logout"), " "),
        (pick(col("id"), 12, 5) + 1).cast("int")).as("event_type"),
      struct(
        format_string("/page/%d", pick(col("id"), 13, 20)).as("page"),
        userOf(col("id"), 14).as("user_id"),
        when(pick(col("id"), 15, 10) < 3,
          struct((pick(col("id"), 16, 5) + 500).cast("int").as("error_code")))
          .otherwise(lit(null)).as("extra")).as("details"))
    base.unionByName(base.orderBy("event_id").limit(100))
  }

  /** 600 tickets with 1–5-message arrays (UTF-8 Cyrillic texts — encoding
    * canary, SURVEY.md §7.4 trap 8) and created/updated ordering, ~3%
    * anomalous (created > updated) for the P6 filter.
    */
  def supportTickets(spark: SparkSession): DataFrame =
    spark.range(600).select(
      format_string("tick_%04d", col("id")).as("ticket_id"),
      userOf(col("id"), 21).as("user_id"),
      element_at(split(lit("open closed pending resolved"), " "),
        (pick(col("id"), 22, 4) + 1).cast("int")).as("status"),
      element_at(split(lit("billing technical account delivery"), " "),
        (pick(col("id"), 23, 4) + 1).cast("int")).as("issue_type"),
      transform(sequence(lit(1), pick(col("id"), 24, 5) + 1), i =>
        struct(
          when(i % 2 === 1, "клиент").otherwise("поддержка").as("sender"),
          concat(lit("сообщение №"), i).as("message"))).as("messages"),
      expr(s"$t0 + make_interval(0,0,0, pmod(hash(id, 25), 180), 0,0,0)")
        .as("created_at"))
      .withColumn("updated_at",
        when(pick(col("ticket_id"), 27, 33) === 0,
          expr("created_at - make_interval(0,0,0,0, 5, 0,0)"))
        .otherwise(expr(
          "created_at + make_interval(0,0,0,0, pmod(hash(ticket_id, 26), 72), 0,0)")))

  /** 200 recommendations — one per user, 2–8 products. */
  def userRecommendations(spark: SparkSession): DataFrame =
    spark.range(200).select(
      format_string("user_%04d", col("id")).as("user_id"),
      transform(sequence(lit(0), pick(col("id"), 31, 7) + 1),
        i => format_string("prod_%03d", pmod(hash(col("id"), i, lit(32)), lit(50))))
        .as("recommended_products"),
      expr(s"$t0 + make_interval(0,0,0, pmod(hash(id, 33), 180), 0,0,0)")
        .as("last_updated"))

  /** 800 reviews with rating 1–5 (the CHECK-constraint domain) and 0–2
    * moderation flags.
    */
  def moderationQueue(spark: SparkSession): DataFrame =
    spark.range(800).select(
      format_string("rev_%04d", col("id")).as("review_id"),
      userOf(col("id"), 41).as("user_id"),
      productOf(col("id"), 42).as("product_id"),
      concat(lit("отзыв о товаре №"), col("id")).as("review_text"),
      (pick(col("id"), 43, 5) + 1).cast("int").as("rating"),
      element_at(split(lit("pending approved rejected"), " "),
        (pick(col("id"), 44, 3) + 1).cast("int")).as("moderation_status"),
      pickSome(col("id"), 45, "spam offensive fake short adult",
        pick(col("id"), 46, 3)).as("flags"),
      expr(s"$t0 + make_interval(0,0,0, pmod(hash(id, 47), 180), 0,0,0)")
        .as("submitted_at"))
}
