package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** ScaleGen v2 — realistic scale fixtures, generated from scratch.
  *
  * The v1 generator (ScaleGen) scales the shipped sf dirs by COPYING
  * them, which preserves two degenerate properties that round-11's
  * 1000x probes showed were distorting what the probes measure:
  *
  *  - the base corpus has a ~31-word vocabulary, so x70's query-term
  *    screen prunes nothing (every query's term set IS the vocabulary)
  *    and the BM25 postings aggregation degenerates to corpus x vocab;
  *  - the copied ids form a decimal lattice (orig + copy * 10^8) that
  *    aliased the old linear fixed-count predicate (fixedCountPred
  *    silently selected 27x its target — see PLANS.md round 11).
  *
  * v2 generates every row deterministically from a seeded xxhash64 of
  * its sequential index, with:
  *
  *  - **Zipfian vocabulary** per language (default 30k terms): ranks are
  *    drawn by inverse-CDF (`floor(exp(u * ln V))`, P(r) ~ 1/r), the
  *    head holds real stopwords (graft.text.TextAnalysis's langid
  *    lists) + common filler so the language/quality gates classify
  *    generated text exactly like real text, and the tail is synthetic
  *    lang-prefixed words (`translate(rank, digits, letters)`), so
  *    cross-language shingle overlap is zero.
  *  - **Avalanche-mixed ids**: doc_id/vec_id = xxhash64(seed, i) >>> 1 —
  *    no arithmetic structure for a bucket predicate to alias on; the
  *    generator asserts uniqueness (a hash, not a bijection).
  *  - **Configurable dup rate**: `dupPct`% of docs copy an earlier
  *    doc's content seed — half byte-exact (exact-dedup prey), half
  *    with ONE token substituted (minhash/simhash/span-dedup prey).
  *    Embedding dups are byte-exact (x57's representative collapse).
  *  - **Clustered embeddings**: 10 seeded centers in [-1,1]^64 with
  *    +-0.2 per-component noise, so cosine thresholds and ANN recall
  *    gates see genuine cluster structure instead of shifted copies.
  *  - **Zipf-skewed sources** (20 domains), so temperature mixing has
  *    a real head/tail mass imbalance to correct.
  *
  * Round 14 adds the FULL table set (`factScale` > 0): region, nation,
  * customer, supplier, part, orders, lineitem, events — so the whole
  * catalog can run ONE realistic sweep instead of splitting between v1
  * cipher facts and v2 text. `factScale` counts sf0.001-equivalents
  * (factScale = 10000 reproduces the v1 100×-of-sf0.1 row counts:
  * events 10M, orders 15M, lineitem ~60M, customer 1.5M). Shapes mirror
  * the shipped testdata — sequential fact keys, uniform user traffic,
  * the same FK containments (user_id domain ⊂ c_custkey domain), 1-7
  * lines per order (mean 4), money columns EXACTLY 2dp (the
  * discRevenue decimal-parity contract), `props` exactly `{"k": N}`
  * (the q12/x38 regex-vs-variant parity shape) — because the fact
  * family's cost does not depend on value realism, and mirroring keeps
  * v2 fact rows comparable with the v1 scale records. Eval splits
  * derive from doc_id % 20 as before; factScale = 0 (default) emits
  * documents + embeddings only. Output is asserted against the
  * oracle-parity fixture invariants ([[graft.FixtureInvariants]]),
  * which round 14 extended to the fact tables.
  *
  * usage: Test/runMain graft.tools.ScaleGenV2 <outDir> <nDocs> <nVecs> <dupPct> [seed] [factScale]
  */
object ScaleGenV2 {

  /** Head words per language. Rank 1..head.size draws from these; the
    * langid stopword lists lead so stopword hits track real text. The
    * three lists are pairwise disjoint and contain no other language's
    * stopwords, so predLang classifies every generated doc by its own
    * head (given >=1 stopword draw; 'und' otherwise, which the gates
    * drop — realistic attrition).
    */
  private val heads: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "for", "on",
      "with", "data", "model", "train", "batch", "value", "stream",
      "table", "query", "index", "merge", "filter", "window", "group",
      "sort", "scan", "join", "order", "part", "line", "row", "key",
      "hash", "fast", "slow", "small", "large", "count", "total",
      "system", "result", "output", "input", "record", "field", "store",
      "cache", "shard", "block", "page", "node"),
    "de" -> Seq("der", "die", "und", "das", "ein", "ist", "mit", "auf",
      "nicht", "auch", "wert", "daten", "tisch", "spalte", "zeile",
      "gruppe", "folge", "satz", "menge", "teil", "feld", "werk",
      "zahl", "kette", "stueck", "punkt", "stand", "lauf", "zug", "bau"),
    "es" -> Seq("el", "los", "y", "las", "una", "que", "mas", "este",
      "por", "con", "dato", "valor", "tabla", "fila", "columna",
      "grupo", "orden", "parte", "campo", "clave", "conteo", "suma",
      "bloque", "pagina", "nodo", "indice", "mezcla", "filtro",
      "ventana", "carga"))

  /** Tail-word prefix per language (tail words never collide with any
    * head word or another language's tail).
    */
  private val tailPrefix = Map("en" -> "v", "de" -> "g", "es" -> "j")

  private val VOCAB = 30000 // ranks per language (head + synthetic tail)

  /** Uniform-ish double in [0,1) from a seeded per-slot hash. */
  private def u01(cols: Column*): Column =
    (pmod(xxhash64(cols: _*), lit(1000000L)).cast("double") + lit(0.5)) /
      lit(1000000.0)

  /** Zipf(s=1) rank in [1, VOCAB]: floor(exp(u * ln V)) — P(rank = r)
    * is proportional to ln(1 + 1/r) ~ 1/r.
    */
  private def zipfRank(u: Column): Column =
    least(lit(VOCAB), greatest(lit(1),
      floor(exp(u * lit(math.log(VOCAB.toDouble)))).cast("int")))

  /** Word for `rank` in `lang`'s vocabulary: the head list for low
    * ranks, else a deterministic synthetic word (rank digits mapped to
    * letters, lang-prefixed).
    */
  private def word(lang: String, rank: Column): Column = {
    val head = heads(lang)
    when(rank <= head.size,
      element_at(typedLit(head), rank))
      .otherwise(concat(lit(tailPrefix(lang)),
        translate(rank.cast("string"), "0123456789", "abcdefghij")))
  }

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val nDocs = args(1).toLong
    val nVecs = args(2).toLong
    val dupPct = args(3).toInt
    val seed = if (args.length > 4) args(4).toLong else 42L
    val factScale = if (args.length > 5) args(5).toLong else 0L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, out, nDocs, nVecs, dupPct, seed, factScale)
    spark.stop()
  }

  /** The generator body, callable from a spec (no session lifecycle). */
  def generate(spark: SparkSession, out: String, nDocs: Long, nVecs: Long,
               dupPct: Int, seed: Long = 42L, factScale: Long = 0L): Unit = {
    // vec ids are drawn as the first nVecs doc ids (subset property the
    // x77 doc∩vec retrieval corpus depends on) — impossible otherwise
    require(nVecs <= nDocs,
      s"vec ids must be a subset of doc ids: nVecs=$nVecs > nDocs=$nDocs")
    val i = col("id")
    def h(tag: String, cols: Column*): Column =
      xxhash64((lit(seed) +: lit(tag) +: cols): _*)

    // dup structure: content derives from `ci` (an earlier index for
    // dups), so exact dups are byte-identical with zero joins and near
    // dups recompute the parent stream and substitute one token
    val isDup = i > 0 && pmod(h("dup", i), lit(100L)) < dupPct
    val parent = pmod(h("parent", i), greatest(i, lit(1L)))
    val ci = when(isDup, parent).otherwise(i)
    val isNear = isDup && pmod(h("kind", i), lit(2L)) === 0

    // per-content attributes (shared by exact dups)
    val langPick = pmod(h("lang", ci), lit(100L))
    val nToks = (lit(20L) + pmod(h("len", ci), lit(180L))).cast("int")
    val srcRank = // Zipf over 20 domains: head sources dominate
      least(lit(20), greatest(lit(1),
        floor(exp(u01(h("src", ci)) * lit(math.log(20.0)))).cast("int")))
    // one substituted token position + replacement rank (near dups only;
    // keyed on i, not ci, so the copy differs from its parent)
    val nearPos = (pmod(h("npos", i), nToks.cast("long")) + 1).cast("int")

    def textFor(lang: String): Column =
      concat_ws(" ", transform(sequence(lit(1), nToks), p => {
        val base = word(lang, zipfRank(u01(h("tok", ci), p)))
        when(isNear && p === nearPos,
          word(lang, zipfRank(u01(h("ntok", i), p)))).otherwise(base)
      }))

    val text = when(langPick < 80, textFor("en"))
      .when(langPick < 90, textFor("de"))
      .otherwise(textFor("es"))
    val lang = when(langPick < 80, "en").when(langPick < 90, "de")
      .otherwise("es")

    spark.range(nDocs)
      .repartition(32)
      .select(
        shiftrightunsigned(h("docid", i), 1).as("doc_id"),
        text.as("text"), lang.as("lang"),
        concat(lit("src"), srcRank.cast("string")).as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: 10 seeded cluster centers in [-1,1]^64, +-0.2 noise;
    // dups (same rate, exact only) share `vci` so their float arrays are
    // byte-identical — x57's representative collapse has real prey
    val isVDup = i > 0 && pmod(h("vdup", i), lit(100L)) < dupPct
    val vci = when(isVDup, pmod(h("vparent", i), greatest(i, lit(1L))))
      .otherwise(i)
    val label = pmod(h("label", vci), lit(10L)).cast("int")
    val emb = transform(sequence(lit(0), lit(63)), d => {
      // seed participates (via h) so "seeded centers" is literally true:
      // a new seed moves the cluster geometry, not just the noise
      val center = pmod(h("ctr", label, d), lit(2001L))
        .cast("double") / 1000.0 - 1.0
      val noise =
        (pmod(h("nzd", vci, d), lit(2001L)).cast("double") / 1000.0 - 1.0) * 0.2
      (center + noise).cast("float")
    })
    // vec_id shares doc_id's hash tag so vec ids are a SUBSET of doc
    // ids (nVecs <= nDocs), like the shipped fixtures' overlapping id
    // spaces — x77's doc∩vec retrieval corpus would otherwise be empty
    spark.range(nVecs)
      .repartition(32)
      .select(
        shiftrightunsigned(h("docid", i), 1).as("vec_id"),
        emb.as("embedding"), label.as("label"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    if (factScale > 0) generateFacts(spark, out, factScale, seed)

    // id uniqueness (xxhash64 is a hash, not a bijection — collision
    // odds at 5M rows are ~1e-6, but ids are join keys downstream, so
    // assert rather than assume)
    val dDocs = spark.read.parquet(s"$out/documents.parquet")
    val dVecs = spark.read.parquet(s"$out/embeddings.parquet")
    require(dDocs.select("doc_id").distinct().count() == nDocs,
      "doc_id collision — change the seed")
    require(dVecs.select("vec_id").distinct().count() == nVecs,
      "vec_id collision — change the seed")
    graft.FixtureInvariants.assertClean(spark, out)
    // generation profile, for the PLANS.md record
    dDocs.groupBy("lang").agg(count(lit(1)).as("n"),
      avg(length(col("text"))).as("avg_chars")).orderBy("lang").show()
    println(s"[scalegen-v2] $out: $nDocs docs / $nVecs vecs, dup=$dupPct%, " +
      s"seed=$seed, factScale=$factScale")
  }

  /** The fact-table half: row counts per sf0.001-equivalent unit follow
    * the shipped testdata exactly (events 1000, orders 1500, lineitem
    * E[4]/order, customer 150, part 200, supplier 10, users 15), so a
    * factScale-10000 corpus is row-for-row comparable with the v1
    * 100×-of-sf0.1 records. Every value is a pure seeded-hash function
    * of the row index — deterministic, no RNG, regenerate-identical.
    */
  private def generateFacts(spark: SparkSession, out: String,
                            factScale: Long, seed: Long): Unit = {
    val i = col("id")
    def h(tag: String, cols: Column*): Column =
      xxhash64((lit(seed) +: lit(tag) +: cols): _*)
    /** Exactly-2dp money value in [lo, hi): ONE division of exact
      * integer total-cents — the discRevenue oracle does exact decimal
      * arithmetic FROM the 2dp sources, so round(x, 2) must be the
      * identity on every money double (adding the offset AFTER the
      * division double-rounds and breaks that — the invariant caught
      * exactly this in the first draft).
      */
    def money(tag: String, lo: Double, hi: Double): Column =
      ((pmod(h(tag, i), lit(((hi - lo) * 100).toLong)) +
        lit((lo * 100).toLong)).cast("double") / 100.0)
    def pick(tag: String, vs: Seq[String]): Column =
      element_at(typedLit(vs), pmod(h(tag, i), lit(vs.size.toLong))
        .cast("int") + 1)
    def write(df: org.apache.spark.sql.DataFrame, name: String,
              parts: Int = 8): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")

    val nCust = 150L * factScale
    val nOrders = 1500L * factScale
    val nPart = 200L * factScale
    val nSupp = 10L * factScale
    val nEvents = 1000L * factScale
    val nUsers = 15L * factScale // ⊂ customer key domain, as shipped

    write(spark.createDataFrame(Seq(
      (0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
      (4, "MIDDLE EAST"))).toDF("r_regionkey", "r_name"), "region", 1)
    write(spark.range(25).select(i.cast("int").as("n_nationkey"),
      concat(lit("NATION_"), i.cast("string")).as("n_name"),
      (i % 5).cast("int").as("n_regionkey")), "nation", 1)

    write(spark.range(nCust).repartition(32).select(
      i.as("c_custkey"),
      concat(lit("Customer#"), lpad(i.cast("string"), 9, "0")).as("c_name"),
      pmod(h("cnat", i), lit(25L)).cast("int").as("c_nationkey"),
      money("cbal", -1000.0, 10000.0).as("c_acctbal"),
      pick("cseg", Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY")).as("c_mktsegment")), "customer")

    write(spark.range(nSupp).repartition(32).select(
      i.as("s_suppkey"),
      concat(lit("Supplier#"), lpad(i.cast("string"), 9, "0")).as("s_name"),
      pmod(h("snat", i), lit(25L)).cast("int").as("s_nationkey"),
      money("sbal", 0.0, 10000.0).as("s_acctbal")), "supplier")

    write(spark.range(nPart).repartition(32).select(
      i.as("p_partkey"),
      concat_ws(" ",
        pick("padj", Seq("cold", "hot", "blue", "red", "small", "large")),
        pick("pnoun", Seq("widget", "bolt", "gear", "anvil", "ring",
          "plate"))).as("p_name"),
      concat(lit("Brand#"), (pmod(h("pbr", i), lit(25L)) + 1).cast("string"))
        .as("p_brand"),
      pick("ptyp", Seq("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY",
        "PROMO")).as("p_type"),
      (pmod(h("psz", i), lit(50L)) + 1).cast("int").as("p_size"),
      ((pmod(h("prp", i), lit(1000L)) + lit(9000L)).cast("double") / 10.0)
        .as("p_retailprice")), "part")

    // orders: 1995-01-01 + 0..2400 days, micros timestamps (shipped span)
    val epoch95 = java.time.LocalDate.of(1995, 1, 1).toEpochDay * 86400L
    write(spark.range(nOrders).repartition(32).select(
      i.as("o_orderkey"),
      pmod(h("ocust", i), lit(nCust)).as("o_custkey"),
      pick("ostat", Seq("F", "O", "P")).as("o_orderstatus"),
      money("oprice", 900.0, 500000.0).as("o_totalprice"),
      timestamp_seconds(lit(epoch95) +
        pmod(h("odate", i), lit(2400L)) * 86400L).as("o_orderdate"),
      pick("oprio", Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW")).as("o_orderpriority")), "orders")

    // lineitem derives from the WRITTEN orders (one read, FK-exact):
    // 1-7 lines per order (mean 4, the shipped shape), shipdate =
    // orderdate + 1..90 days
    val o = spark.read.parquet(s"$out/orders.parquet")
      .select(col("o_orderkey").as("id"), col("o_orderdate"))
    val li = o.select(i, col("o_orderdate"),
        explode(sequence(lit(1), (pmod(h("onl", i), lit(7L)) + 1).cast("int")))
          .as("l_linenumber"))
    val ln = col("l_linenumber")
    write(li.select(
      i.as("l_orderkey"),
      pmod(h("lpart", i, ln), lit(nPart)).as("l_partkey"),
      pmod(h("lsupp", i, ln), lit(nSupp)).as("l_suppkey"),
      ln,
      (pmod(h("lqty", i, ln), lit(50L)) + 1).cast("double").as("l_quantity"),
      // one division of exact total-cents, like money() — see its note
      ((pmod(h("lep", i, ln), lit(10400000L)) + lit(90000L)).cast("double")
        / 100.0).as("l_extendedprice"),
      (pmod(h("ldis", i, ln), lit(11L)).cast("double") / 100.0).as("l_discount"),
      (pmod(h("ltax", i, ln), lit(9L)).cast("double") / 100.0).as("l_tax"),
      element_at(typedLit(Seq("A", "N", "R")),
        pmod(h("lrf", i, ln), lit(3L)).cast("int") + 1).as("l_returnflag"),
      element_at(typedLit(Seq("F", "O")),
        pmod(h("lls", i, ln), lit(2L)).cast("int") + 1).as("l_linestatus"),
      (col("o_orderdate") + make_dt_interval(
        pmod(h("lsd", i, ln), lit(90L)) + 1)).as("l_shipdate")),
      "lineitem", 16)

    // events: one month of micros timestamps, uniform users (the
    // shipped profile — cleaning-op dirt lives in the in-repo fixtures,
    // not the driver testdata), props EXACTLY '{"k": N}'
    val epoch24 = java.time.LocalDate.of(2024, 1, 1).toEpochDay * 86400L
    write(spark.range(nEvents).repartition(32).select(
      i.as("event_id"),
      timestamp_micros(lit(epoch24 * 1000000L) +
        pmod(h("ets", i), lit(30L * 86400L * 1000000L))).as("ts"),
      pmod(h("euser", i), lit(nUsers)).as("user_id"),
      pick("etype", Seq("click", "view", "purchase", "signup", "error"))
        .as("event_type"),
      money("eval", 0.0, 330.0).as("value"),
      concat(lit("{\"k\": "), pmod(h("ek", i), lit(100L)).cast("string"),
        lit("}")).as("props")), "events")

    println(s"[scalegen-v2] facts at $out: scale=$factScale " +
      s"(events=$nEvents orders=$nOrders customers=$nCust)")
  }
}
