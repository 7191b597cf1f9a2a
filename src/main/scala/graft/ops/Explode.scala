package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Array unnest, parent→child derivation, and array measures.
  *
  * Reference:
  *  - J3 `LATERAL UNNEST(pages_visited)`:
  *    `final-module-3/airflow/dags/build_analytical_marts.py:57-58,67-68`
  *  - J4 FK parent→child materialization (pets → pet_favfoods):
  *    `HW-2/airflow/dags/sources_to_linear.py:73-79`
  *  - A8 `COALESCE(array_length(arr,1),0)`:
  *    `mongo_to_postgres_replication.py:230,233` — Spark `size(NULL)` is -1,
  *    so the null guard is explicit (SURVEY.md §7.4 trap 2).
  *  - F12 `";".join(favs)`: `HW-2/airflow/dags/sources_to_linear.py:70`
  *
  * Scale design: `explode` compiles to a Generate node — a narrow,
  * pipelined operator with no shuffle; child-table derivation therefore
  * costs zero exchanges on top of the parent scan.
  */
object Explode {

  /** Unnest `arr` to one row per element, keeping `keep` columns; empty
    * and NULL elements are dropped (matches UNNEST of a text[]).
    */
  def unnest(df: DataFrame, arr: Column, as: String, keep: Column*): DataFrame =
    df.select((keep :+ explode(arr).as(as)): _*).filter(col(as).isNotNull && col(as) =!= "")

  /** Null-safe array length (A8): `size(NULL)` → 0, not -1. */
  def sizeOrZero(c: Column): Column = when(c.isNull, 0).otherwise(size(c))

  /** Per-row array measures: element count + ';'-joined string (A8 + F12). */
  def arrayStats(df: DataFrame, key: Column, arr: Column): DataFrame =
    df.select(
      key,
      sizeOrZero(arr).as("n_items"),
      array_join(arr, ";").as("joined"))
}
