package graft.neardup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic Bloom filter over the portable md5-base
  * key family — the broadcast-bitmask membership test a 100 TB
  * decontamination pass runs BEFORE any join.
  *
  * Why a bloom at scale: the exact decontamination join ships every
  * training-corpus gram into a (broadcast or shuffled) join against the
  * eval-set gram index. At 100 TB the corpus side is the dominant cost
  * even when the eval side broadcasts — every gram crosses the join
  * operator. A Bloom filter collapses the eval side to a FIXED-size bit
  * array (kilobytes regardless of eval-set size), broadcast once; the
  * probe is pure map-side integer arithmetic inside whole-stage
  * codegen, and only the (tiny) bloom-hit fraction of the corpus ever
  * reaches the exact-confirm join. No false negatives by construction,
  * so exact-confirming the hits reproduces the exact join's output
  * byte-for-byte.
  *
  * Unlike engine blooms (Spark's `BloomFilterAggregate` runtime filter
  * uses JVM-internal hashing), every bit here is a deterministic pure
  * function of the key string: positions are affine maps of the 60-bit
  * md5 base ([[NearDup.portableBase]]) with splitmix-derived
  * multipliers, so a DuckDB oracle rebuilds the IDENTICAL bit array and
  * replays membership — including the false positives — making
  * bloom-side outputs hash-checkable, not rows-only.
  *
  * Words are 63 bits wide (not 64): the per-bit mask `1 << (p % 63)`
  * then never reaches the sign bit, so masks and words stay strictly
  * non-negative signed-64 values in every engine — the same
  * stay-positive discipline as the 15-nibble (60-bit) md5 base.
  */
object Bloom {

  val WordBits = 63

  /** Splitmix-derived position multipliers, indexed from 512 — disjoint
    * from the MinHash slots' [0, numHashes) coefficient indexes so the
    * two portable families never share an affine map.
    */
  val CoefBase = 512
  def coef(j: Int): Long = NearDup.portableCoef(CoefBase + j, 0)

  /** The j-th bit position of a key in [0, mBits): the key's 60-bit md5
    * base folded through `(base % 1000000007) * coef(j) % 999999937
    * % mBits` — the Knuth-spread shape the Sampling/Sharding family
    * uses, with the prime reduction BEFORE the final `% mBits`: a
    * direct `(base · coef) % mBits` hits only multiples of
    * gcd(coef, mBits) (measured: 41% FP where theory says 2% — mBits is
    * composite by design, 63 · words), while the prime fold spreads
    * uniformly first so the final fold's bias is O(mBits / 1e9).
    * Products bounded by 1.001e9 · 2^31 < 2^62 (ANSI-overflow-safe);
    * inputs non-negative so plain `%` lands in [0, mBits).
    */
  def position(base: Column, j: Int, mBits: Long): Column =
    base % lit(1000000007L) * lit(coef(j)) % lit(999999937L) % lit(mBits)

  /** Build the filter as ONE row with an `array<bigint>` column `blm`
    * of mBits/63 words. Shape: the key side reduces by a partial-agg
    * `bit_or` groupBy on word index (at most mBits/63 groups — constant
    * size regardless of key count), densified against `range(nWords)`
    * and packed with an order-pinned `array_sort(collect_list(struct))`
    * so the array layout is deterministic under any partitioning.
    */
  def build(keys: DataFrame, keyCol: String, mBits: Long, k: Int): DataFrame = {
    require(mBits % WordBits == 0, s"mBits must be a multiple of $WordBits")
    val nWords = mBits / WordBits
    val base = NearDup.portableBase(col(keyCol))
    val pos = (0 until k).map(j => position(base, j, mBits))
    keys.select(explode(array(pos: _*)).as("p"))
      .select(expr(s"p div $WordBits").as("w"),
        expr(s"shiftleft(cast(1 as bigint), cast(p % $WordBits as int))").as("m"))
      .groupBy("w").agg(expr("bit_or(m)").as("bits"))
      .join(keys.sparkSession.range(nWords).withColumnRenamed("id", "w"),
        Seq("w"), "right")
      .select(struct(col("w"), coalesce(col("bits"), lit(0L)).as("bits")).as("wb"))
      .agg(array_sort(collect_list(col("wb"))).as("wbs"))
      .select(transform(col("wbs"), x => x.getField("bits")).as("blm"))
  }

  /** Adds boolean `hitCol` to `df`: true iff all k filter bits for
    * `keyCol` are set in the broadcast 1-row `build` output — pure
    * map-side arithmetic + `element_at` lookups into the broadcast
    * array, no shuffle of `df` and no per-row allocation.
    */
  def probe(df: DataFrame, keyCol: String, blm: DataFrame, mBits: Long,
            k: Int, hitCol: String = "bloom_hit"): DataFrame = {
    val conds = (0 until k).map { j =>
      val p = s"(__bb % 1000000007 * ${coef(j)} % 999999937 % $mBits)"
      expr(s"(element_at(blm, cast($p div $WordBits as int) + 1)" +
        s" & shiftleft(cast(1 as bigint), cast($p % $WordBits as int))) <> 0")
    }
    df.withColumn("__bb", NearDup.portableBase(col(keyCol)))
      .crossJoin(broadcast(blm))
      .withColumn(hitCol, conds.reduce(_ && _))
      .drop("__bb", "blm")
  }
}
