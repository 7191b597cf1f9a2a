package graft

/** The five recall/quality gates (x27/x32/x33/x34/x35) must (a) hold on
  * real testdata and (b) pass VACUOUSLY — not throw — on empty input.
  * (b) is load-bearing: under Spark 4's default ANSI mode `hits / 0`
  * raises SparkArithmeticException [DIVIDE_BY_ZERO] instead of yielding
  * NULL, so the zero-denominator case has to be branched around with
  * `when(denom === 0, true)`; a coalesce-after-divide guard is dead code.
  */
class RecallGateSpec extends SparkSpec {

  private val gates = Seq("x27_ann_recall", "x32_embed_neardup_recall",
    "x33_minhash_recall", "x34_simhash_recall", "x35_lsh_ann_recall",
    "x40_multimodal_gate", "x47_pq_recall", "x49_ivfpq_recall",
    "x68_jl_recall")

  private def gateHolds(name: String, dir: String): Unit = {
    val out = SparkEntry.queries(name)(spark, dir)
    val rows = out.collect()
    assert(rows.length == 1, s"$name: expected one gate row")
    val r = rows(0)
    // every boolean column in a gate row is an invariant — all must hold
    val boolIdx = out.schema.fields.zipWithIndex
      .collect { case (f, i) if f.dataType.typeName == "boolean" => i }
    assert(boolIdx.nonEmpty, s"$name: gate row has no boolean columns")
    boolIdx.foreach { i =>
      assert(r.getBoolean(i), s"$name: gate ${out.schema(i).name} is false")
    }
  }

  test("all recall/quality gates hold on sf0.001") {
    gates.foreach(gateHolds(_, sfDir))
    spark.catalog.clearCache()
  }

  test("gates are vacuously TRUE, not DIVIDE_BY_ZERO, on empty tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_sf_").toString
    Seq("documents", "embeddings").foreach { t =>
      Tables.table(spark, sfDir, t).limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    gates.foreach(gateHolds(_, dir))
    spark.catalog.clearCache()
  }

  test("x33/x34 adaptive probe widens past a vacuous fixed sample") {
    import org.apache.spark.sql.functions._
    // 600 docs ⇒ the fixed-count start is bucket count 2, which keeps
    // EVEN ids only (the Knuth multiplier is odd, so the spread
    // preserves id parity mod 2). Every dup pair below sits at ODD ids
    // ⇒ the k=2 sample holds ZERO truth pairs and a fixed gate would be
    // vacuously TRUE; the adaptive rule must widen to k=1 (full corpus)
    // and land all 12 pairs.
    val rows = (0 until 600).map { i =>
      val isDup = i % 50 == 1 || i % 50 == 3 // 24 docs = 12 pairs, all odd ids
      // every token carries the group id so pairs are identical WITHIN a
      // group and share zero shingles ACROSS groups (or with solos)
      val text =
        if (isDup) (0 until 8).map(w => s"g${i / 50}t$w").mkString(" ")
        else s"solo document number $i with unique filler f${i}a f${i}b f${i}c"
      (i.toLong, text, "en", "test", text.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_adaptive_").toString
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq("x33_minhash_recall", "x34_simhash_recall").foreach { name =>
      val r = SparkEntry.queries(name)(spark, dir).collect()(0)
      assert(r.getLong(0) == 12L,
        s"$name: adaptive landing should reach the full corpus (12 pairs), got ${r.get(0)}")
      assert(r.getBoolean(1), s"$name: recall gate false on identical dup pairs")
    }
    spark.catalog.clearCache()
  }
}
