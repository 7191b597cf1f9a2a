package graft.functions

import graft.{SparkSpec, Tables}
import graft.sim.Similarity
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot product matches the higher-order-function form bit-exactly") {
    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val paired = emb.as("a").join(emb.as("b"),
      col("a.vec_id") + 1 === col("b.vec_id"))
    val diff = paired.select(
        Similarity.dot(col("a.v"), col("b.v")).as("native"),
        Similarity.dotHof(col("a.v"), col("b.v")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() == 0)
  }

  test("null array input yields null; simple known value") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(Similarity.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0))
  }

  test("dot_product is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val v = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect()(0).getDouble(0)
    assert(v == 11.0)
    GraftFunctions.register(spark) // idempotent
  }

  test("whole-stage codegen executes the expression (no fallback errors)") {
    // force a wide scan through the codegen path
    val n = Tables.embeddings(spark, sfDir)
      .select(Similarity.dot(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")).as("norm2"))
      .filter(col("norm2") > 0).count()
    assert(n > 0)
  }
}
