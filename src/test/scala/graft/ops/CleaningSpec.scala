package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  test("numericText fixes decimal comma, nulls empties and garbage") {
    val df = Seq("1,5", "2.75", "", "abc", null).toDF("t")
      .select(Cleaning.numericText(col("t")).as("v"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(1.5), Some(2.75), None, None, None))
  }

  test("parseTsMultiFormat accepts both formats, nulls mismatches") {
    val df = Seq("05-03-2024 10:20:30", "05-03-2024 10:20", "2024-03-05", "")
      .toDF("t").select(Cleaning.parseTsMultiFormat(col("t")).as("ts"))
    val out = df.collect().map(r => Option(r.get(0)).map(_.toString))
    assert(out(0).contains("2024-03-05 10:20:30.0"))
    assert(out(1).contains("2024-03-05 10:20:00.0"))
    assert(out(2).isEmpty && out(3).isEmpty)
  }

  test("normEquals and nonEmpty predicates") {
    val df = Seq(("  IN ", "x"), ("out", ""), ("In", null)).toDF("a", "b")
    assert(df.filter(Cleaning.normEquals(col("a"), "in")).count() == 2)
    assert(df.filter(Cleaning.nonEmpty(col("b"))).count() == 1)
  }

  test("cleanEvents types and filters the events table") {
    val out = Cleaning.cleanEvents(graft.Tables.events(spark, sfDir))
    assert(out.columns.toSeq ==
      Seq("event_id", "user_id", "event_type", "day", "value"))
    assert(out.schema("day").dataType.typeName == "date")
    assert(out.count() > 0)
  }
}
