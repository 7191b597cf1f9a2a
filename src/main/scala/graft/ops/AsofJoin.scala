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
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, rightVals: Seq[String],
                   suffix: String = "_asof"): DataFrame = {
    val rvTypes = rightVals.map(v => v -> right.schema(v).dataType)
    val leftOnly = left.columns.filterNot(keys.contains).toSeq

    val lTagged = rvTypes.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))) {
      case (df, (v, t)) => df.withColumn(s"$v$suffix", lit(null).cast(t))
    }
    val rCore = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts")) ++
        rightVals.map(v => col(v).as(s"$v$suffix")): _*)
      .withColumn("__side", lit(0))
    val rTagged = leftOnly.foldLeft(rCore) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val ordered = lTagged.columns.toSeq
    val unioned = lTagged.select(ordered.map(col): _*)
      .unionByName(rTagged.select(ordered.map(col): _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rvTypes.foldLeft(unioned) { case (df, (v, _)) =>
      df.withColumn(s"$v$suffix", last(col(s"$v$suffix"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__ts", "__side")
  }
}
