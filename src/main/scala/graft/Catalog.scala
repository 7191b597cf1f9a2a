package graft

import org.apache.spark.sql.SparkSession

/** SQL-surface convenience: register every testdata table as a temp view
  * so the whole engine is also reachable through `spark.sql(...)` — the
  * reference's user-facing surface was SQL text (SURVEY.md §0), and
  * Spark's own SQL dialect covers the same queries (percentile_cont,
  * FILTER aggregates, ROLLUP, window functions are all Spark SQL too).
  */
object Catalog {
  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerTables(spark: SparkSession, sfDir: String): Unit =
    tableNames.foreach { t =>
      // events needs the nanos-timestamp handling in Tables.events
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.table(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }
}
