package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sink operators mapping the reference's write semantics onto parquet.
  *
  * Reference → Spark (SURVEY.md §2.1):
  *  - K1 truncate-and-reload (`TRUNCATE` + insert, e.g. `HW-3/airflow/
  *    dags/iot_temperature.py:44-46`) → `mode(Overwrite)` full refresh.
  *  - K3 insert-if-absent (`ON CONFLICT DO NOTHING`, `mongo_to_postgres_
  *    replication.py:57-64`) → anti-join against existing keys, then
  *    append.
  *  - K5 targeted window delete + rebuild (`HW-4/.../iot_temperature.py:
  *    160-161`) → DYNAMIC partition overwrite on a partitioned layout:
  *    only partitions present in the incoming frame are replaced; 100 TB
  *    of untouched history is neither read nor rewritten.
  *
  * Partitioning policy: partition columns must be low-cardinality
  * (day/month), never high-cardinality keys — each partition should hold
  * file-sized data at the target scale.
  */
object Sinks {

  /** K1: idempotent full refresh. */
  def truncateReload(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** K1 + partition routing: full refresh of a day/month-partitioned
    * layout (the final module's monthly range partitioning,
    * `final-module-3/init/init.sql:91-136`).
    */
  def partitionedReload(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)

  /** K5/K4: replace ONLY the partitions present in `window` (the
    * incremental recompute), leaving older partitions untouched.
    */
  def overwriteWindow(window: DataFrame, path: String, partitionCol: String): Unit =
    window.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(path)

  /** K4: full-row keyed upsert into a parquet target (`ON CONFLICT DO
    * UPDATE`): incoming wins, existing survives where unclaimed
    * (`Incremental.upsertByKey`). The merge is pinned with
    * `localCheckpoint` before writing because the target path is also
    * the read source — production would stage + atomically swap instead
    * of relying on executor-local blocks, but the merge/overwrite
    * semantics are identical.
    */
  def upsertReload(incoming: DataFrame, path: String, keys: Seq[String]): Unit = {
    val spark = incoming.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return truncateReload(incoming, path)
    val merged = graft.ops.Incremental
      .upsertByKey(spark.read.parquet(path), incoming, keys)
      .localCheckpoint(true)
    merged.write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** K3: append only rows whose key is absent from the existing data.
    * Bootstraps ONLY when the target genuinely does not exist — any
    * other read failure (corrupt footer, permissions, transient FS
    * error) propagates instead of silently overwriting history.
    */
  def appendIfAbsent(incoming: DataFrame, existingPath: String,
                     keys: Seq[String]): Unit = {
    val spark = incoming.sparkSession
    val path = new org.apache.hadoop.fs.Path(existingPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return truncateReload(incoming, existingPath)
    val existing = spark.read.parquet(existingPath)
      .select(keys.map(col): _*).distinct()
    incoming.join(existing, keys, "left_anti")
      .write.mode(SaveMode.Append).parquet(existingPath)
  }
}
