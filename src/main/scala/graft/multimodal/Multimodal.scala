package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * with a decode/feature-extract stage over partitions.
  *
  * Design for the real pipeline: image/audio/video bytes live in a
  * `binary` column; decode and feature extraction run batch-wise per
  * partition (`mapPartitions` over a typed Dataset here; in PySpark this
  * is the `mapInPandas` slot). The decode itself is STUBBED with a
  * deterministic fake (this container has no image/audio libs — the stub
  * derives metadata arithmetically from the payload bytes), but every
  * Spark-side piece — schema, encoders, partition-batched iteration,
  * column pruning of the heavy binary column — is real and tested.
  *
  * Scale notes: the binary column is only materialized inside the decode
  * stage; metadata-only consumers prune it at the parquet scan. Decode is
  * map-only (no shuffle) and sized by `spark.sql.files.maxPartitionBytes`,
  * which is the knob that keeps 100 TB of media from overwhelming
  * executor memory.
  */
object Multimodal {

  case class MediaIn(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, fake_width: Long,
                       fake_height: Long, format: String)

  /** Attach an opaque binary payload column (here: UTF-8 bytes of the
    * text column, standing in for image bytes).
    */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Partition-batched "decode": deterministic fake metadata from the
    * payload bytes. Swap the body for a real codec (JAI/ffmpeg) when the
    * libs exist — the signature and plan shape don't change.
    */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      it.map { m =>
        val n = m.payload.length.toLong
        MediaMeta(m.doc_id, n, n % 640L, (n * 7L) % 480L,
          if (n % 2 == 0) "png" else "jpeg")
      }
    }
  }
}
