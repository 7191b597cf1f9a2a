package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Sampling
import graft.sim.Similarity

/** The x06 scale-knob probe (in-tree so the PLANS.md row is
  * reconstructible, TEST scope like ScaleGen): times
  * `Similarity.cosineTopKLsh` at a given (nbits, tables) over a corpus
  * dir — x06's query-set rule (fixed-count Knuth sample, ~40 queries)
  * and dim/k — and reports wall + mean recall@5 against the in-plan
  * brute-force truth for the same queries.
  *
  * Why it exists: the CATALOG x06 entry keeps a fixed (nbits=6,
  * tables=8) shape because its DuckDB oracle must replay the exact
  * bucket structure from interpolated plane constants; at a 100×
  * corpus that fixed shape saturates its 64 buckets/table and the
  * candidate join crosses linear (PLANS.md round-9 100× table). The
  * production knob is nbits ~ log2(corpus/targetBucket); this probe is
  * the committed evidence that turning it restores the sub-linear cost
  * at preserved recall.
  *
  * usage: Test/runMain graft.tools.LshKnobProbe <dir> <nbits> <tables>
  */
object LshKnobProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, nbitsS, tablesS) = args.take(3)
    val (nbits, tables) = (nbitsS.toInt, tablesS.toInt)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, dir)
    val buckets = math.max(1L, emb.count() / 40).toInt
    val pred = Sampling.hashBucket(col("vec_id"), buckets) === 0

    def lsh() = Similarity.cosineTopKLsh(emb, "vec_id", "embedding", pred,
      dim = 64, k = 5, nbits = nbits, tables = tables)
    def timedCount(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = lsh().count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    timedCount() // warm: codegen + footers, same hygiene as Bench
    val (wall, rows) = timedCount()
    val brute = Similarity.cosineTopK(emb, "vec_id", "embedding", pred, k = 5)
      .select("qid", "nid")
    val hit = lsh().select("qid", "nid").join(brute, Seq("qid", "nid"), "left_semi")
    val recall = hit.count().toDouble / math.max(1L, brute.count())
    println(f"[lshknob] dir=$dir nbits=$nbits tables=$tables " +
      f"rows=$rows wall=$wall%.2fs recall@5=$recall%.3f")
    spark.stop()
  }
}
