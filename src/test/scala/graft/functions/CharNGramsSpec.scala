package graft.functions

import graft.SparkSpec
import graft.functions.CharNGrams.charNGrams
import org.apache.spark.sql.functions._

class CharNGramsSpec extends SparkSpec {
  import spark.implicits._

  test("char n-grams match the substring formulation, incl. multibyte") {
    val df = Seq(
      "hello world",
      "абвгд",            // 2-byte chars
      "日本語テキスト",      // 3-byte chars
      "mix аб 語x",
      "abc", "ab", "", "a").toDF("t")
    val both = df.select(
      charNGrams(col("t"), 3).as("native"),
      when(length(col("t")) >= 3,
        expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))"))
        .otherwise(array().cast("array<string>")).as("composed"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch: ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
  }

  test("null in, null out; n=1 yields the char sequence") {
    val df = Seq(Option("ab"), None).toDF("t")
    val out = df.select(charNGrams(col("t"), 1).as("g")).collect()
    assert(out(0).getSeq[String](0) == Seq("a", "b"))
    assert(out(1).isNullAt(0))
  }

  test("char_ngrams is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val v = spark.sql("SELECT char_ngrams('abcd', 3) AS g")
      .collect()(0).getSeq[String](0)
    assert(v == Seq("abc", "bcd"))
  }

  test("a non-string child fails at analysis, not at runtime") {
    import org.apache.spark.sql.GraftSqlBridge
    val df = Seq(42).toDF("i")
    val bad = GraftSqlBridge.column(
      CharNGrams(GraftSqlBridge.expression(col("i")), 3))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(bad).collect()
    }
    assert(e.getMessage.contains("STRING"), s"unexpected error: ${e.getMessage}")
  }

  test("codegen and interpreted paths agree") {
    val df = Seq.tabulate(50)(i => s"doc $i с текстом 語").toDF("t")
    val viaCodegen = df.select(charNGrams(col("t"), 4).as("g")).collect()
      .map(_.getSeq[String](0))
    // force interpreted evaluation
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(charNGrams(col("t"), 4).as("g")).collect()
        .map(_.getSeq[String](0))
      assert(viaCodegen.toSeq == interpreted.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
