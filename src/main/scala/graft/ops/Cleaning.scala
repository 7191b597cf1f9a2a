package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Clean-layer operators: typed projection of raw text columns, normalize-
  * compare filters, null/empty predicates, multi-format timestamp parsing.
  *
  * Reference semantics (see SURVEY.md §2.2/§2.8):
  *  - typed projection P1: `HW-3/airflow/dags/iot_temperature.py:48-62`
  *  - normalize filter P2: `HW-3/airflow/dags/iot_temperature.py:58`
  *  - non-null/non-empty P3: `HW-3/airflow/dags/iot_temperature.py:59-62`
  *  - decimal-comma fix F2 + NULLIF F3: `HW-3/.../iot_temperature.py:55`
  *  - two-format COALESCE timestamp parse F5: `HW-3/.../iot_temperature.py:51-54`
  *
  * All of these are pure column expressions — they stay inside whole-stage
  * codegen and are pushed into/next to the scan by Catalyst, so the clean
  * layer costs one pass over the data at any scale.
  */
object Cleaning {

  /** `lower(trim(c)) = v` — P2. */
  def normEquals(c: Column, v: String): Column = lower(trim(c)) === v

  /** `c IS NOT NULL AND c <> ''` — P3. */
  def nonEmpty(c: Column): Column = c.isNotNull && c =!= ""

  /** Text → double with decimal-comma fix and empty→NULL (F2, F3, F7):
    * `NULLIF(replace(temp, ',', '.'), '')::numeric`.
    */
  def numericText(c: Column): Column =
    nullif(translate(c, ",", "."), lit("")).try_cast("double")

  /** Two-format timestamp parse with COALESCE fallback (F5). Relies on
    * non-ANSI `to_timestamp` returning NULL on pattern mismatch, exactly
    * reproducing the reference's COALESCE chain.
    */
  def parseTsMultiFormat(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("dd-MM-yyyy HH:mm:ss")),
      try_to_timestamp(c, lit("dd-MM-yyyy HH:mm")))

  /** Typed IoT-style clean projection over the `events` table standing in
    * for the raw readings (FIXTURES.md §B): event ts → day, keep non-null
    * measures, drop rows whose type normalizes to empty.
    */
  def cleanEvents(events: DataFrame): DataFrame =
    events
      .filter(col("value").isNotNull && trim(lower(col("event_type"))) =!= "")
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        to_date(col("ts")).as("day"),
        col("value"))
}
