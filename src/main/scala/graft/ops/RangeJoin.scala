package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: pair rows whose numeric values lie within ±radius,
  * without a cross join (brief's custom-operator list; composed per
  * preference (a)).
  *
  * Implementation: quantize values into bands of width `radius`; each
  * left row joins only the 3 adjacent bands (its own ±1), which by
  * construction contain every candidate within ±radius; an exact filter
  * removes the band false-positives. Work is O(rows × band density) —
  * the distributed interval-join pattern — versus O(n²) for the naive
  * theta join the same SQL would express.
  */
object RangeJoin {

  /** Self range join: for each row of `df`, the OTHER rows whose
    * `valueCol` is within ±radius. Output: left key, right key, both
    * values. Keys must be unique per row.
    */
  def selfRangeJoin(df: DataFrame, keyCol: String, valueCol: String,
                    radius: Double): DataFrame = {
    val banded = df.select(col(keyCol).as("k"), col(valueCol).as("v"))
      .withColumn("band", floor(col("v") / radius).cast("long"))
    val expanded = banded.withColumn("probe_band",
      explode(array(col("band") - 1, col("band"), col("band") + 1)))
    expanded.as("a")
      .join(banded.as("b"), col("a.probe_band") === col("b.band") &&
        col("a.k") =!= col("b.k"))
      // BETWEEN (not abs-diff): bit-identical to the SQL oracle's
      // `b BETWEEN a-r AND a+r` on boundary values
      .filter(col("b.v").between(col("a.v") - radius, col("a.v") + radius))
      .select(col("a.k").as("key_a"), col("b.k").as("key_b"),
        col("a.v").as("val_a"), col("b.v").as("val_b"))
  }

  /** Per-left-row match count over the self range join, keeping
    * zero-match rows (left join semantics).
    */
  def rangeMatchCounts(df: DataFrame, keyCol: String, valueCol: String,
                       radius: Double): DataFrame = {
    val matches = selfRangeJoin(df, keyCol, valueCol, radius)
      .groupBy(col("key_a").as(keyCol))
      .agg(count(lit(1)).as("n_within"))
    df.select(col(keyCol), col(valueCol))
      .join(matches, Seq(keyCol), "left")
      .select(col(keyCol), col(valueCol),
        coalesce(col("n_within"), lit(0L)).as("n_within"))
  }
}
