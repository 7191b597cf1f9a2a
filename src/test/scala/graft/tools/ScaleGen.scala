package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-bench corpus generator (in-tree since round 6 so the
  * PLANS.md 10x/100x tables are reconstructible from committed code;
  * TEST scope since round 8 so `src/main` holds only engine code).
  * Every generated corpus is checked against the oracle-parity
  * fixture invariants ([[graft.FixtureInvariants]]) before the run
  * reports success — the scale corpora feed the 10x/100x bench
  * verifies, which rely on the same invariants as the shipped sf dirs.
  * Regenerates the synthetic scaled corpora of PLANS.md rounds 3-6 at
  * any factor:
  *
  *  - documents, model=caesar: per-copy Caesar-shifted alphabets (round
  *    3/5 model; distinct cross-copy shingles only up to 25 copies)
  *  - documents, model=subst: per-copy substitution cipher from a
  *    seeded Fisher-Yates permutation of a-z — the caesar model
  *    generalized past 25 copies (100× needs 100 distinct mappings so
  *    cross-copy shingle overlap stays zero and pair density LINEAR)
  *  - documents, model=tag: 'copyN ' PREFIX tag, text otherwise intact
  *    (the language-gated x41/x44 queries need English stopwords)
  *  - embeddings: id-shifted copies
  *  - facts (10x only): every key +copy*10^8, FK-consistent per copy
  *
  * usage: Test/runMain graft.tools.ScaleGen <srcDir> <outDir> <factor> <model> [facts]
  */
object ScaleGen {
  private def perm(seed: Int): String = {
    val a = ('a' to 'z').toArray
    var s = seed.toLong * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
    def next(): Long = { s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27; s & Long.MaxValue }
    var i = a.length - 1
    while (i > 0) { val j = (next() % (i + 1)).toInt; val t = a(i); a(i) = a(j); a(j) = t; i -= 1 }
    new String(a)
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out, factorS, model) = args.take(4)
    val factor = factorS.toInt
    val facts = args.length > 4 && args(4) == "facts"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val SHIFT = 100000000L
    val alpha = "abcdefghijklmnopqrstuvwxyz"

    // spread the (tiny, often single-partition) base table across the
    // local cores BEFORE the broadcast cross join — the per-copy text
    // substitution runs pre-shuffle, and at factor 1000 a one-partition
    // base serializes 5M-row × per-char work onto one task
    def copies(df: DataFrame): DataFrame =
      df.repartition(32)
        .crossJoin(spark.range(factor).select(col("id").as("__copy")))

    // documents
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docText = model match {
      case "caesar" =>
        // copy c: shift alphabet by c (c=0 identity), as rounds 3-5
        val shifted = (0 until factor).map(c => alpha.drop(c % 26) + alpha.take(c % 26))
        val cases = (0 until factor).foldLeft(lit(null).cast("string")) { (acc, c) =>
          when(col("__copy") === c, translate(col("text"), alpha, shifted(c))).otherwise(acc)
        }
        cases
      case "subst" =>
        // Data-driven substitution, flat at any factor: a when-branch
        // per copy (the pre-round-9 spelling) blows Janino past 100ish
        // branches, so instead the per-copy alphabet is element_at'd out
        // of one literal array and applied per character — identical
        // output to translate(text, alpha, perm(c)) for every factor
        val perms = (0 until factor).map(c => if (c == 0) alpha else perm(c))
        val permArr = array(perms.map(lit): _*)
        val p = element_at(permArr, (col("__copy") + 1).cast("int"))
        concat_ws("",
          transform(split(col("text"), ""), ch =>
            when(ch >= "a" && ch <= "z", p.substr(ascii(ch) - 96, lit(1)))
              .otherwise(ch)))
      case "tag" =>
        concat(lit("copy"), col("__copy").cast("string"), lit(" "), col("text"))
    }
    copies(docs)
      .select((col("doc_id") + col("__copy") * SHIFT).as("doc_id"),
        docText.as("text"), col("lang"), col("source"), col("n_chars"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: id-shifted copies
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    copies(emb)
      .select((col("vec_id") + col("__copy") * SHIFT).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // dims: copy through unchanged
    for (t <- Seq("region", "nation"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    if (facts) {
      def shift(df: DataFrame, keys: Seq[String]): DataFrame =
        keys.foldLeft(copies(df)) { (d, k) =>
          d.withColumn(k, col(k) + col("__copy") * SHIFT)
        }.drop("__copy")
      shift(spark.read.parquet(s"$src/customer.parquet"), Seq("c_custkey"))
        .repartition(8).write.mode("overwrite").parquet(s"$out/customer.parquet")
      shift(spark.read.parquet(s"$src/supplier.parquet"), Seq("s_suppkey"))
        .repartition(8).write.mode("overwrite").parquet(s"$out/supplier.parquet")
      shift(spark.read.parquet(s"$src/part.parquet"), Seq("p_partkey"))
        .repartition(8).write.mode("overwrite").parquet(s"$out/part.parquet")
      shift(spark.read.parquet(s"$src/orders.parquet"), Seq("o_orderkey", "o_custkey"))
        .repartition(8).write.mode("overwrite").parquet(s"$out/orders.parquet")
      shift(spark.read.parquet(s"$src/lineitem.parquet"),
          Seq("l_orderkey", "l_partkey", "l_suppkey"))
        .repartition(16).write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      // events: TIMESTAMP(NANOS) ts — read via nanosAsLong (writes ts as
      // int64; Tables.events converts LongType ts in-plan, so consumers
      // see the same timestamps)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val evs = spark.read.parquet(s"$src/events.parquet")
      shift(evs, Seq("event_id", "user_id"))
        .repartition(8).write.mode("overwrite").parquet(s"$out/events.parquet")
    }
    graft.FixtureInvariants.assertClean(spark, out)
    println(s"[scalegen] wrote $out factor=$factor model=$model facts=$facts (invariants OK)")
  }
}
