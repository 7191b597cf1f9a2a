package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mode / top-1-per-group: most frequent `dim` value per group key.
  *
  * Reference: most-frequent device/page/action per (user, month) via
  * `GROUP BY keys, dim` + `ROW_NUMBER() OVER (PARTITION BY keys
  * ORDER BY COUNT(*) DESC)` + `rn = 1` (SURVEY.md A6/W2;
  * `final-module-3/airflow/dags/build_analytical_marts.py:41-69`).
  *
  * Scale design: the groupBy produces at most |keys|·|dim-domain| rows —
  * map-side partial aggregation collapses the raw data before the shuffle,
  * and the window then runs over the (small) aggregated set partitioned by
  * the group key, so no single partition ever sees more than the dim
  * domain. Deterministic tiebreak (dim ascending) keeps the oracle stable.
  */
object Top1PerGroup {

  /** Returns one row per group: group keys + `dim` (the mode) + `cnt`. */
  def top1(df: DataFrame, keys: Seq[String], dim: String): DataFrame = {
    val counted = df.groupBy((keys :+ dim).map(col): _*).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("cnt").desc, col(dim).asc)
    counted
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Generic ranked filter: keep rank-1 row per partition under `order`. */
  def keepFirst(df: DataFrame, partitionBy: Seq[Column], order: Seq[Column]): DataFrame =
    df.withColumn("rn",
        row_number().over(Window.partitionBy(partitionBy: _*).orderBy(order: _*)))
      .filter(col("rn") === 1)
      .drop("rn")
}
