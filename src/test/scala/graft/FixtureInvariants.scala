package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-engine parity invariants the oracle dialect RELIES on but
  * cannot itself check, factored out so BOTH consumers assert the same
  * list: FixtureInvariantSpec pins the three shipped sf dirs, and
  * tools.ScaleGen asserts every corpus it generates (a generator change
  * that reintroduced empty docs or dirty embeddings would otherwise
  * reach the 10x/100x bench verifies unchecked).
  *
  *  - documents ASCII-only: x48 slices UTF-8 BYTES on the Spark side
  *    (binary payload) while its DuckDB twin slices CHARACTERS — the
  *    two agree only for pure-ASCII text.
  *  - documents non-empty text: the x17/x20i (and x53/x56) oracles
  *    build vectors from UNNEST(range(length(text))), which drops an
  *    empty doc entirely, while fakeEmbed keeps a zero vector for it —
  *    corpus/query membership and the Knuth-spread init ordering would
  *    silently diverge on the first empty document.
  *  - embeddings no NaN / -0.0 components: x57 groups byte-identical
  *    vectors on the raw float array; Spark normalizes -0.0 to 0.0 and
  *    treats NaN = NaN in grouping keys, DuckDB's GROUP BY on DOUBLE[]
  *    need not — a fixture with either value would split twin groups
  *    differently across engines.
  */
object FixtureInvariants {

  /** (invariant name, violating-row count) for every invariant whose
    * input table exists under `dir`; all counts zero ⇔ corpus clean.
    */
  def violations(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val checks = Seq.newBuilder[(String, Long)]
    if (new java.io.File(s"$dir/documents.parquet").exists) {
      val docs = Tables.documents(spark, dir)
      checks += "documents: non-ASCII text (x48 byte/char slicing)" ->
        docs.filter(octet_length(col("text")) =!= length(col("text"))).count()
      checks += "documents: empty/null text (x17/x20i/x53/x56 UNNEST(range))" ->
        docs.filter(col("text").isNull || length(col("text")) === 0).count()
    }
    if (new java.io.File(s"$dir/embeddings.parquet").exists) {
      // -0.0 detection via the string form — comparison operators can't
      // see the sign bit, and ANSI mode rejects the 1/v = -Inf trick
      checks += "embeddings: NaN or -0.0 component (x57 group-key parity)" ->
        Tables.embeddings(spark, dir)
          .filter(expr(
            "exists(embedding, v -> isnan(v) OR cast(v AS string) = '-0.0')"))
          .count()
    }
    // fact-table invariants (round 14, for ScaleGenV2 factScale corpora;
    // also hold on the shipped sf dirs — FixtureInvariantSpec pins that)
    if (new java.io.File(s"$dir/events.parquet").exists) {
      val ev = Tables.events(spark, dir)
      // q12/x38 parity: the Spark side reads props via variant_get, the
      // DuckDB twin via regexp '"k": (-?[0-9]+)' — both agree only on
      // the exact '{"k": N}' shape
      checks += "events: props not exactly '{\"k\": N}' (q12/x38 regex parity)" ->
        ev.filter(!col("props").rlike("""^\{"k": -?[0-9]+\}$""")).count()
      checks += "events: null ts/user/type (day-cast + grouping oracles)" ->
        ev.filter(col("ts").isNull || col("user_id").isNull ||
          col("event_type").isNull).count()
      checks += "events: duplicate event_id (dedup/join key)" ->
        (ev.count() - ev.select("event_id").distinct().count())
    }
    if (new java.io.File(s"$dir/lineitem.parquet").exists) {
      val li = Tables.lineitem(spark, dir)
      // the discRevenue oracle does EXACT decimal arithmetic from the
      // 2dp sources — a 3+dp money value would desync the two engines'
      // rounding
      checks += "lineitem: money column not exactly 2dp (discRevenue parity)" ->
        li.filter(round(col("l_extendedprice"), 2) =!= col("l_extendedprice") ||
          round(col("l_discount"), 2) =!= col("l_discount") ||
          round(col("l_tax"), 2) =!= col("l_tax")).count()
      if (new java.io.File(s"$dir/orders.parquet").exists) {
        val ok = Tables.orders(spark, dir).select("o_orderkey")
        checks += "lineitem: orphan l_orderkey (J4 FK explode)" ->
          li.select(col("l_orderkey").as("o_orderkey"))
            .join(ok, Seq("o_orderkey"), "left_anti").count()
      }
    }
    if (new java.io.File(s"$dir/orders.parquet").exists) {
      val o = Tables.orders(spark, dir)
      checks += "orders: duplicate o_orderkey (join key)" ->
        (o.count() - o.select("o_orderkey").distinct().count())
    }
    checks.result()
  }

  /** Assert-all used by ScaleGen right after generating a corpus. */
  def assertClean(spark: SparkSession, dir: String): Unit = {
    val dirty = violations(spark, dir).filter(_._2 > 0)
    require(dirty.isEmpty,
      s"generated corpus $dir violates oracle-parity fixture invariants: " +
        dirty.map { case (n, c) => s"$n ($c rows)" }.mkString("; "))
  }
}
