package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant two-phase (salted) aggregation.
  *
  * A hot grouping key sends all its rows to one reducer; salting spreads
  * each key over `salts` sub-keys for a partial aggregate, then merges
  * the partials in a second (tiny) aggregate. Correct for any
  * commutative, mergeable aggregate — sum/count here, which also derive
  * avg exactly. The salt is `pmod(hash(payload), salts)`: deterministic
  * from the data, so re-runs produce identical partials (no RNG).
  *
  * At 100 TB this is the difference between a straggler task holding the
  * stage for hours and an even spread; AQE's skew-join handling covers
  * joins, but aggregation skew needs this explicit two-phase shape.
  */
object Skew {

  /** Salted sum+count per key; avg derived exactly from the merged
    * partials. Output: keys..., n, total, avg_value (rounded to 2).
    */
  def saltedAvg(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16): DataFrame = {
    val salt = pmod(hash(col(valueCol), lit(0x5a17)), lit(salts)).as("__salt")
    val partial = df
      .groupBy((keys.map(col) :+ salt): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__sum"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum("__n").as("n"),
        round(sum("__sum"), 2).as("total"),
        round(sum("__sum") / sum("__n"), 2).as("avg_value"))
  }

  /** Salting helper for skewed JOIN keys: explode the small side over all
    * salt values, salt the big side by row — each (key, salt) bucket
    * joins independently. Returns (bigSalted, smallExploded, saltCol).
    */
  def saltJoinSides(big: DataFrame, small: DataFrame, salts: Int)
      : (DataFrame, DataFrame, String) = {
    val bigSalted = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val smallExploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    (bigSalted, smallExploded, "__salt")
  }
}
