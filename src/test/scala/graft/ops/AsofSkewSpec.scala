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
}
