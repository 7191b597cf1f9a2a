package graft

/** Pins the oracle-parity corpus invariants (see [[FixtureInvariants]]
  * for the per-invariant rationale) on the three SHIPPED sf dirs. The
  * same list is asserted by tools.ScaleGen on every corpus it
  * generates, so the 10x/100x bench corpora are covered by the same
  * contract — a fixture or generator change that breaks an invariant
  * fails loudly here instead of silently desynchronizing a hash
  * compare.
  */
class FixtureInvariantSpec extends SparkSpec {

  private val shipped = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(d).exists)

  test("shipped fixtures satisfy every oracle-parity invariant") {
    assert(shipped.nonEmpty, "no shipped testdata dirs found")
    val dirty = shipped.flatMap { d =>
      FixtureInvariants.violations(spark, d)
        .filter(_._2 > 0)
        .map { case (name, n) => s"$d: $name ($n rows)" }
    }
    assert(dirty.isEmpty,
      "fixture invariant violations:\n  " + dirty.mkString("\n  "))
  }

  test("invariant checker itself detects dirty corpora (no vacuous pass)") {
    // A checker that silently skipped a table (or a detection expression
    // that stopped matching) would green-light a dirty corpus — prove
    // each detector fires on a minimal synthetic violation.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_fixinv_").toString
    spark.range(2).select(col("id").as("doc_id"),
        when(col("id") === 0, "héllo").otherwise("").as("text"),
        lit("en").as("lang"), lit("web").as("source"), lit(5L).as("n_chars"))
      .write.parquet(s"$dir/documents.parquet")
    spark.range(2).select(col("id").as("vec_id"),
        when(col("id") === 0,
          array(lit(Float.NaN), lit(1.0f)))
          .otherwise(array(lit(-0.0f), lit(1.0f))).as("embedding"),
        lit(0).as("label"))
      .write.parquet(s"$dir/embeddings.parquet")
    val v = FixtureInvariants.violations(spark, dir).toMap
    assert(v("documents: non-ASCII text (x48 byte/char slicing)") == 1L)
    assert(v("documents: empty/null text (x17/x20i/x53/x56 UNNEST(range))") == 1L)
    assert(v("embeddings: NaN or -0.0 component (x57 group-key parity)") == 2L)
    assert(intercept[IllegalArgumentException](
      FixtureInvariants.assertClean(spark, dir))
      .getMessage.contains("oracle-parity"))
  }
}
