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
    * partials. Output: keys..., n, total, avg_value.
    *
    * `exactCents = true` (for 2-dp money values) sums integer cents, so
    * the two-phase result is bit-identical to a single-phase aggregate
    * at ANY partitioning — integer addition is associative, double
    * addition is not. Default keeps generic double sums (rounded to 2).
    */
  def saltedAvg(df: DataFrame, keys: Seq[String], valueCol: String,
                salts: Int = 16, exactCents: Boolean = false): DataFrame = {
    // salt from a per-row id, NOT from hash(value): when a hot key's
    // values are constant or null (the common skew case) a value-derived
    // salt sends every row to ONE bucket and the spread degenerates.
    // The id is partition-order-dependent, but sum/count partials are
    // merge-associative, so the merged result is unchanged (and with
    // exactCents, bit-identical).
    val salt = pmod(hash(monotonically_increasing_id()), lit(salts)).as("__salt")
    val v = col(valueCol)
    val sumExpr = if (exactCents) sum(round(v * 100, 0).cast("long")) else sum(v)
    val partial = df
      .groupBy((keys.map(col) :+ salt): _*)
      .agg(count(lit(1)).as("__rows"),
        // avg must ignore nulls like plain avg(value): separate non-null
        // denominator from the row count
        count(v).as("__vals"),
        sumExpr.as("__sum"))
    val merged = partial.groupBy(keys.map(col): _*)
      .agg(sum("__rows").as("n"), sum("__vals").as("__vals"),
        sum("__sum").as("__sum"))
    if (exactCents)
      merged.select((keys.map(col) :+ col("n") :+
        (col("__sum") / 100.0).as("total") :+
        (floor(col("__sum") / col("__vals") + 0.5) / 100.0).as("avg_value")): _*)
    else
      merged.select((keys.map(col) :+ col("n") :+
        round(col("__sum"), 2).as("total") :+
        round(col("__sum") / col("__vals"), 2).as("avg_value")): _*)
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
