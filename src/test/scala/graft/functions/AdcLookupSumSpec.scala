package graft.functions

import graft.SparkSpec
import graft.sim.Similarity
import org.apache.spark.sql.functions._

class AdcLookupSumSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic (codes, dtabs) frame: 500 rows, 8 subspaces, 5
    * centroids per table — pure column arithmetic, no RNG.
    */
  private def fixture = spark.range(500).select(
    col("id"),
    transform(sequence(lit(0), lit(7)),
      i => pmod(col("id") * 31 + i * 7, lit(5)).cast("int")).as("codes"),
    transform(sequence(lit(0), lit(7)), i =>
      transform(sequence(lit(0), lit(4)),
        j => pmod(col("id") + i * 13 + j * 29, lit(97)) / lit(10.0))).as("dtabs"))

  test("native ADC lookup-sum matches the higher-order-function form bit-exactly") {
    val diff = fixture.select(
        round(AdcLookupSum.adcNative(col("codes"), col("dtabs")), 6).as("native"),
        Similarity.adcSimHof(col("codes"), col("dtabs")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("null array input yields null; simple known value") {
    val df = Seq(
      (Some(Seq(0, 2, 1)),
        Some(Seq(Seq(0.5, 1.0, 2.0), Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))),
      (None, Some(Seq(Seq(1.0)))))
      .toDF("codes", "dtabs")
    val out = df.select(
      AdcLookupSum.adcNative(col("codes"), col("dtabs")).as("s")).collect()
    assert(out(0).getDouble(0) == 0.5 + 3.0 + 5.0)
    assert(out(1).isNullAt(0))
  }

  test("out-of-range code throws instead of silently misreading") {
    val df = Seq((Seq(3), Seq(Seq(1.0, 2.0)))).toDF("codes", "dtabs")
    val e = intercept[Exception] {
      df.select(AdcLookupSum.adcNative(col("codes"), col("dtabs"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[ArrayIndexOutOfBoundsException]),
      s"expected an out-of-range failure, got: $e")
  }

  test("adc_lookup_sum is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val v = spark.sql(
      "SELECT adc_lookup_sum(array(1, 0), " +
        "array(array(0.25d, 0.75d), array(2.0d, 4.0d))) AS s")
      .collect()(0).getDouble(0)
    assert(v == 0.75 + 2.0)
    GraftFunctions.register(spark) // idempotent
  }

  test("whole-stage codegen executes the expression (no fallback errors)") {
    val n = fixture
      .select(AdcLookupSum.adcNative(col("codes"), col("dtabs")).as("s"))
      .filter(col("s") >= 0).count()
    assert(n == 500)
  }
}
