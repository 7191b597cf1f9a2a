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
    *
    * PRECONDITION (same as [[selfRangeJoin]]): keys unique per row.
    * The histogram spelling subtracts exactly ONE self instance per
    * row, so with unique keys it equals the pair spelling's per-key
    * counts. With DUPLICATE keys the two diverge by design: two rows
    * sharing a key within ±radius count each other here ("all OTHER
    * ROWS within ±radius"), while the pair spelling's `a.k =!= b.k`
    * excluded every same-key pair ("all other KEYS"). The x16 consumer
    * (p_partkey) satisfies the precondition; the duplicate-key
    * row-semantics is spec-pinned in RangeJoinSpec (ADVICE r11).
    *
    * NOT spelled as `selfRangeJoin(...).groupBy.count`: that enumerates
    * every candidate pair, and pair cardinality is O(n × band density) —
    * n²/bands on a value domain of fixed width, i.e. ~10⁴× the work at a
    * 100× duplicated corpus (the round-11 100× sweep wedged here). Since
    * the OUTPUT is only a count, aggregate first: build the value
    * histogram (bounded by DISTINCT values, invariant under row
    * duplication), count band-neighbour mass histogram-vs-histogram, and
    * join the per-value count back to rows. A row's matches are all rows
    * within ±radius minus itself, so n_within = Σ cnt(v′ within ±r) − 1.
    * Work: O(D × distinct-band-density) for D distinct values — constant
    * under duplication, never worse than the pair spelling when all
    * values are distinct.
    */
  def rangeMatchCounts(df: DataFrame, keyCol: String, valueCol: String,
                       radius: Double): DataFrame = {
    val hist = df.groupBy(col(valueCol).as("__rj_v"))
      .agg(count(lit(1)).as("__rj_cnt"))
    val banded = hist.withColumn("__rj_band",
      floor(col("__rj_v") / radius).cast("long"))
    val expanded = banded.withColumn("__rj_probe",
      explode(array(col("__rj_band") - 1, col("__rj_band"),
        col("__rj_band") + 1)))
    val near = expanded.as("a")
      .join(banded.as("b"), col("a.__rj_probe") === col("b.__rj_band"))
      // BETWEEN (not abs-diff): bit-identical to the SQL oracle's
      // `b BETWEEN a-r AND a+r` on boundary values
      .filter(col("b.__rj_v").between(col("a.__rj_v") - radius,
        col("a.__rj_v") + radius))
      .groupBy(col("a.__rj_v").as("__rj_v"))
      .agg(sum(col("b.__rj_cnt")).as("__rj_near"))
    // LEFT join: a NULL value never matches the BETWEEN (so 0 matches in
    // the pair semantics) and would be dropped by an inner equi-join.
    df.select(col(keyCol), col(valueCol))
      .join(near, col(valueCol) === near("__rj_v"), "left")
      .select(col(keyCol), col(valueCol),
        coalesce(col("__rj_near") - 1, lit(0L)).cast("long").as("n_within"))
  }
}
