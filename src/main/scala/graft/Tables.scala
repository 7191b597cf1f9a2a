package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata layout
  * (`/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`, see TESTDATA.md).
  *
  * Scans stay fully declarative so Catalyst pushes filters and prunes
  * columns into the parquet reader — at 100 TB the scan is the dominant
  * cost and `PushedFilters`/`ReadSchema` must reach the file source.
  */
object Tables {
  /** The testdata writer marks its TIMESTAMP(MICROS) columns as
    * NOT-UTC-adjusted, which Spark 4 infers as TIMESTAMP_NTZ
    * (`spark.sql.parquet.inferTimestampNTZ.enabled` defaults true).
    * The engine's temporal semantics — and the DuckDB oracle, whose
    * TIMESTAMP is naive and compared under a UTC session — are defined
    * on TimestampType, so normalize here at the single load point
    * rather than depending on a session conf every caller would have
    * to remember. Under the UTC session tz the cast is a no-op on the
    * underlying micros and stays inside the vectorized scan + codegen.
    */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    df.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(df) {
      (d, f) => d.withColumn(f.name,
        org.apache.spark.sql.functions.col(f.name).cast(TimestampType))
    }
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects by default. Read it as a raw long (legacy conf) and
    * convert ns → microsecond TimestampType in-plan; the conversion is a
    * codegen'd arithmetic expression, so the scan stays vectorized.
    */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    // schema resolution is eager at read time, so the legacy conf can be
    // restored immediately — other readers in the same session must keep
    // failing loudly on unexpected TIMESTAMP(NANOS) columns
    val confKey = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey, "true")
    val df =
      try spark.read.parquet(s"$sfDir/events.parquet")
      finally prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else normalizeNtz(df)
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
