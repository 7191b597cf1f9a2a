package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked top-k and latest-row-by-key.
  *
  * Reference: top-5 hot/cold days `ORDER BY avg_temp DESC/ASC, day LIMIT 5`
  * with a `ROW_NUMBER()` rank column (SURVEY.md W1/T1;
  * `HW-3/airflow/dags/iot_temperature.py:81-98`) and latest-blob-by-id
  * `ORDER BY id DESC LIMIT 1` (T2; `HW-2/airflow/dags/sources_to_linear.py:24,38`).
  *
  * Scale design: `orderBy(...).limit(k)` compiles to TakeOrderedAndProject —
  * each partition keeps only its local top-k, then the driver merges k·p
  * rows; no global sort materializes. The unpartitioned `row_number` window
  * is applied AFTER the limit, so the single-partition window sees ≤ k rows
  * regardless of input size (SURVEY.md §7.4 trap 4).
  */
object TopK {

  /** Global top-k by `order`, with 1-based `rank` column. `order` must be a
    * full deterministic ordering (include tiebreaks) so the oracle compare
    * is stable.
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*)
      .limit(k)
      .withColumn("rnk", row_number().over(Window.orderBy(order: _*)).cast("long"))

  /** Latest single row by a key column (T2). */
  def latestBy(df: DataFrame, key: String): DataFrame =
    df.orderBy(desc(key)).limit(1)
}
