package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Auto-shaped LSH (x85) branch rule and equivalence contract: the
  * nbits schedule is the smallest b ≥ minNbits with n ≤ targetBucket ·
  * 2^b (pure integer compares — replayable as SQL count-range
  * predicates), and on any corpus the auto entry point is EXACTLY the
  * fixed-shape operator at the scheduled nbits.
  */
class LshAutoSpec extends SparkSpec {
  import spark.implicits._

  test("nbits schedule: flat occupancy, integer-exact boundaries") {
    import Similarity.lshAutoNbits
    // shipped sf sizes and the scale corpora land where documented
    assert(lshAutoNbits(500) == 6)     // sf0.001 / sf0.01
    assert(lshAutoNbits(2000) == 6)    // sf0.1
    assert(lshAutoNbits(20000) == 7)   // 10x
    assert(lshAutoNbits(200000) == 10) // 100x
    assert(lshAutoNbits(2000000) == 13) // 1000x
    // exact boundary: n = 256·2^6 stays on 6, one more flips to 7
    assert(lshAutoNbits(256L << 6) == 6)
    assert(lshAutoNbits((256L << 6) + 1) == 7)
    // occupancy n / 2^nbits never exceeds targetBucket
    for (n <- Seq(1L, 100L, 16384L, 16385L, 999999L, 12345678L)) {
      val b = Similarity.lshAutoNbits(n)
      assert(n <= (256L << b), s"occupancy bound violated at n=$n")
    }
    // minNbits floor honored even for tiny corpora
    assert(lshAutoNbits(1, minNbits = 4) == 4)
  }

  test("auto entry point equals the fixed operator at the scheduled nbits") {
    val emb = (0L until 60L).map { i =>
      (i, Array.tabulate(8)(j => ((i * 31 + j * 17) % 13 - 6).toFloat))
    }.toDF("vec_id", "embedding")
    val pred = col("vec_id") < 5
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    // n=60, targetBucket=4: schedule picks b=4 (60 <= 4·16)
    assert(Similarity.lshAutoNbits(60, targetBucket = 4, minNbits = 2) == 4)
    val auto = norm(Similarity.cosineTopKLshAuto(emb, "vec_id", "embedding",
      pred, dim = 8, n = 60, k = 3, targetBucket = 4, minNbits = 2,
      tables = 3))
    val fixed = norm(Similarity.cosineTopKLsh(emb, "vec_id", "embedding",
      pred, dim = 8, k = 3, nbits = 4, tables = 3))
    assert(auto == fixed, "auto must be the fixed operator at scheduled nbits")
  }
}
