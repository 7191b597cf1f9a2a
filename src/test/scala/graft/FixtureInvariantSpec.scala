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

  test("documents fixture has non-empty text at every shipped sf (x17/x20i contract)") {
    // The x17/x20i oracles build vectors from UNNEST(range(length(text)))
    // — an empty doc produces NO vec row there, while fakeEmbed(Int)
    // emits a zero vector for it, so corpus/query membership (and x20i's
    // Knuth-spread init ordering) would silently diverge on the first
    // empty document. Pin the corpus property the byte-compare relies on.
    Seq("sf0.001", "sf0.01", "sf0.1")
      .map(sf => s"/root/testdata/$sf")
      .filter(d => new java.io.File(s"$d/documents.parquet").exists)
      .foreach { d =>
        val empty = Tables.documents(spark, d)
          .filter(col("text").isNull || length(col("text")) === 0)
          .count()
        assert(empty == 0,
          s"$d/documents.parquet holds $empty empty/null-text docs — " +
            "the x17/x20i oracles drop them from the corpus while the " +
            "Spark side keeps zero vectors; guard both sides explicitly " +
            "before relying on the hash compare")
      }
  }
}
