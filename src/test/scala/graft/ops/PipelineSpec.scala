package graft.ops

import graft.{SparkSpec, Tables}
import graft.pipelines.Iot
import org.apache.spark.sql.functions._

/** Pipeline-level invariants: the IoT flagship, marts, incremental
  * merge ≡ full recompute, and validation counts (SURVEY.md §3.1/§2.10).
  */
class PipelineSpec extends SparkSpec {

  test("flagship top5 returns exactly 5 ranked days") {
    val out = Iot.top5Hot(Tables.events(spark, sfDir)).collect()
    assert(out.length == 5)
    assert(out.map(_.getAs[Long]("rnk")).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    // ranked by avg_value desc
    val avgs = out.map(_.getAs[Double]("avg_value"))
    assert(avgs.zip(avgs.tail).forall { case (a, b) => a >= b })
  }

  test("banded clean drops ~10% (outside p05..p95)") {
    val ev = Tables.events(spark, sfDir)
    val n = ev.count().toDouble
    val banded = Iot.cleanBanded(ev).count().toDouble
    assert(banded / n > 0.85 && banded / n <= 0.95)
  }

  test("incremental merge over window equals full recompute (K4/K5 property)") {
    val events = Tables.events(spark, sfDir)
    val daily = events.select(to_date(col("ts")).as("day"), col("value"))
      .groupBy("day")
      .agg(round(avg("value"), 2).as("avg_value"), count(lit(1)).as("n"))
    val cutoff = events.agg(date_sub(max(to_date(col("ts"))), 7).as("cutoff"))
    val incoming = daily.crossJoin(broadcast(cutoff))
      .filter(col("day") >= col("cutoff")).drop("cutoff")
    val merged = Incremental.mergeWindow(daily, incoming, "day", cutoff)
    assert(merged.collect().toSet == daily.collect().toSet)
  }

  test("incremental daily covers exactly the cutoff window") {
    val out = Incremental.incrementalDailyAvg(Tables.events(spark, sfDir), 8)
    assert(out.count() >= 1 && out.count() <= 8)
  }

  test("upsertByKey: incoming wins on conflict, existing survives elsewhere") {
    import spark.implicits._
    val existing = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val incoming = Seq((2L, "B"), (4L, "D")).toDF("k", "v")
    val out = Incremental.upsertByKey(existing, incoming, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
  }

  test("incremental storage round-trip: window overwrite converges to full recompute") {
    val dir = java.nio.file.Files.createTempDirectory("graft_incr_").toString + "/daily"
    val events = Tables.events(spark, sfDir)
    val daily = events.select(to_date(col("ts")).as("day"), col("value"))
      .groupBy("day")
      .agg(round(avg("value"), 2).as("avg_value"), count(lit(1)).as("n"))
      .withColumn("day", col("day").cast("string")) // stable partition values
    // initial full load, then a stale window (half values) overwritten by
    // the incremental recompute of the last 8 days
    graft.sources.Sinks.partitionedReload(daily, dir, "day")
    val cutoff = events.agg(date_sub(max(to_date(col("ts"))), 7).as("cutoff"))
    val staleWindow = daily.crossJoin(broadcast(cutoff))
      .filter(col("day") >= col("cutoff").cast("string")).drop("cutoff")
      .withColumn("avg_value", col("avg_value") * 0.5)
    graft.sources.Sinks.overwriteWindow(staleWindow, dir, "day")
    val fresh = daily.crossJoin(broadcast(cutoff))
      .filter(col("day") >= col("cutoff").cast("string")).drop("cutoff")
    graft.sources.Sinks.overwriteWindow(fresh, dir, "day")
    // partition-column type inference re-types "day" as date on read
    val stored = spark.read.parquet(dir)
      .select(col("day").cast("string"), col("avg_value"), col("n"))
      .collect().toSet
    assert(stored == daily.collect().toSet)
  }

  test("order status mart: status counts sum to n_orders") {
    val m = Marts.orderStatusMart(Tables.orders(spark, sfDir))
    val bad = m.filter(col("n_open") + col("n_filled") + col("n_pending") =!= col("n_orders"))
    assert(bad.count() == 0)
  }

  test("user activity mart joins a top type for every user (A9 validation)") {
    val m = Marts.userActivityMart(Tables.events(spark, sfDir))
    assert(m.count() > 0)
    assert(m.filter(col("top_event_type").isNull).count() == 0)
  }
}
