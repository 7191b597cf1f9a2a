package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsofSkewSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofBackward picks the most recent prior right row per key, inclusive ties") {
    val left = Seq(
      (1L, ts("2024-03-01 10:00:00"), "e1"),
      (1L, ts("2024-03-01 12:00:00"), "e2"),
      (2L, ts("2024-03-01 09:00:00"), "e3")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, ts("2024-03-01 09:30:00"), "s1"),
      (1L, ts("2024-03-01 11:00:00"), "s2"),
      (1L, ts("2024-03-01 12:00:00"), "s3"), // equal ts → inclusive
      (2L, ts("2024-03-01 10:00:00"), "s4")).toDF("k", "rt", "sv")
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", "rt", Seq("sv"))
      .select("ev", "sv_asof").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(out("e1").contains("s1"))
    assert(out("e2").contains("s3")) // ts-equal right row wins (>= semantics)
    assert(out("e3").isEmpty)        // right row is after the left row
  }

  test("saltedAvg equals the plain groupBy aggregate") {
    val df = graft.Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day"), col("value"))
    val salted = Skew.saltedAvg(df, Seq("day"), "value")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(3))).toSet
    val plain = df.groupBy("day")
      .agg(count(lit(1)).as("n"), round(avg("value"), 2).as("a"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("salted join sides cover every (key, salt) bucket exactly once") {
    val big = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
    val small = Seq((1, "A"), (2, "B")).toDF("k", "name")
    val (b, s, saltCol) = Skew.saltJoinSides(big, small, salts = 4)
    val joined = b.join(s, Seq("k", saltCol))
    assert(joined.count() == 3) // every big row matches exactly once
  }

  test("AQE splits a skewed join partition at runtime (the other skew tool)") {
    // manual salting (Skew.saltJoinSides) is the plan-time answer; AQE's
    // skew-join split is the RUNTIME answer — with thresholds sized for
    // test data, a hot key's oversized shuffle partition is split into
    // parallel sub-partitions, visible as `skew=true` on the SMJ node.
    val prev = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import spark.implicits._
      // one pathologically hot key (90% of rows) + a spread tail
      val big = spark.range(0, 20000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          concat(lit("payload_"), col("id")).as(("v")))
      val dim = spark.range(0, 200).select(col("id").as("k"),
        concat(lit("name_"), col("id")).as("name"))
      // aggregate WITHOUT the join key: a groupBy(k) downstream would
      // require the join's hash partitioning and AQE then (correctly)
      // refuses to split the skewed partition
      val joined = big.join(dim, "k").agg(sum(length(col("v"))).as("bytes"))
      joined.collect() // AQE re-plans during execution
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"no skew-split SMJ in final adaptive plan:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
