package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, the most recent right row
  * with `right.ts <= left.ts` for the same key — the canonical
  * time-series enrichment operator (not in the reference; added per the
  * brief's custom-operator list, preference (a): COMPOSED from existing
  * operators rather than a custom SparkPlan).
  *
  * Implementation: tag and union both sides, then one window per key
  * ordered by (ts, side) carrying the right values forward with
  * `last(_, ignoreNulls)`. Right rows sort before left rows on equal
  * timestamps, giving the inclusive (`>=`) as-of semantics.
  *
  * Scale: ONE shuffle on the key (the union is narrow); no range-join
  * pair explosion, no per-key materialization beyond the sort — this is
  * the standard distributed as-of pattern and survives arbitrarily many
  * rows per key (state is O(1) per window position).
  */
object AsofJoin {

  /** Left as-of-backward join. `rightVals` columns arrive suffixed with
    * `suffix`; left rows with no prior right row get nulls.
    *
    * `rightTieBreak` (names from `rightVals`) pins which right row is
    * carried when two right rows share the same (key, ts): the one with
    * the GREATEST tiebreak value. Without it the choice falls to sort
    * order — nondeterministic across partitionings, so any
    * hash-compared output should pass a tiebreak.
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, rightVals: Seq[String],
                   suffix: String = "_asof",
                   rightTieBreak: Seq[String] = Seq.empty): DataFrame = {
    val outNames = rightVals.map(v => s"$v$suffix")
    require(!outNames.exists(left.columns.contains),
      s"right value columns $outNames collide with left columns — pick a suffix")

    // The right values travel as ONE struct: the struct itself is null
    // only for left rows, so `last(_, ignoreNulls)` finds the most recent
    // RIGHT ROW even when its value columns are legitimately NULL (a
    // per-column fill would skip nulls and carry a stale older value).
    val leftOnly = left.columns.filterNot(keys.contains).toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(v => org.apache.spark.sql.types.StructField(v, right.schema(v).dataType)))
    val lTagged = left
      .withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
    val rCore = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts")) :+
        struct(rightVals.map(col): _*).as("__r"): _*)
      .withColumn("__side", lit(0))
    val rTagged = leftOnly.foldLeft(rCore) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val ordered = lTagged.columns.toSeq
    val unioned = lTagged.select(ordered.map(col): _*)
      .unionByName(rTagged.select(ordered.map(col): _*))

    // tiebreak only reorders rows WITHIN equal (ts, side=right) groups:
    // left rows sort after right rows on equal ts regardless (__side=1),
    // and their __r is null so the ordering value is irrelevant to them
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((col("__ts").asc +: col("__side").asc +:
        rightTieBreak.map(v => col("__r").getField(v).asc)): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((left.columns.map(col) ++
        rightVals.map(v => col("__r").getField(v).as(s"$v$suffix"))): _*)
  }
}
