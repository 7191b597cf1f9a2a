package graft

import org.apache.spark.sql.functions._

/** Cross-engine parity invariants the oracle dialect RELIES on but
  * cannot itself check. x48 (frame dedup) slices UTF-8 BYTES on the
  * Spark side (binary payload) while its DuckDB twin slices CHARACTERS
  * (no BLOB md5 in the harness DuckDB) — byte/char arithmetic agrees
  * only for pure-ASCII text, so a single multi-byte character in a
  * future fixture would silently desynchronize frame md5s between
  * engines. Pin the invariant here so it breaks loudly instead.
  */
class FixtureInvariantSpec extends SparkSpec {

  test("documents fixture is pure ASCII at every shipped sf (x48 contract)") {
    Seq("sf0.001", "sf0.01", "sf0.1")
      .map(sf => s"/root/testdata/$sf")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists)
      .foreach { d =>
        val nonAscii = Tables.documents(spark, d)
          .filter(octet_length(col("text")) =!= length(col("text")))
          .count()
        assert(nonAscii == 0,
          s"$d/documents.parquet holds $nonAscii non-ASCII docs — the " +
            "x48 oracle's character slicing no longer matches Spark's " +
            "byte slicing; move the oracle to byte arithmetic first")
      }
  }
}
