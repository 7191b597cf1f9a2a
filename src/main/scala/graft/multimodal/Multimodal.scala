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

  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling: split the payload into up to `maxFrames` byte
    * slices (the video → frames shape: one input row explodes into
    * bounded child rows, pipelined, no shuffle). A real codec replaces
    * the slicing; the (doc, frame_idx, bytes) fan-out contract is what
    * downstream per-frame featurizers consume.
    */
  def frameSample(spark: SparkSession, media: DataFrame,
                  maxFrames: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaIn].flatMap { m =>
      val n = m.payload.length
      val frames = math.min(maxFrames, math.max(1, n / 8))
      (0 until frames).map { i =>
        val from = i * n / frames
        val until = (i + 1) * n / frames
        Frame(m.doc_id, i, java.util.Arrays.copyOfRange(m.payload, from, until))
      }
    }
  }

  /** Resize stub: subsample the payload to AT MOST `target` bytes by
    * taking every ceil(n/target)-th byte — the image/audio resize slot
    * (a real implementation swaps in a scaler; the binary→binary
    * map-only contract and the exact output-size arithmetic are what the
    * pipeline depends on). Payloads already within budget pass through
    * untouched.
    */
  def resizeStub(spark: SparkSession, media: DataFrame,
                 target: Int = 64): Dataset[MediaIn] = {
    import spark.implicits._
    media.as[MediaIn].map { m =>
      val n = m.payload.length
      if (n <= target) m
      else {
        val step = (n + target - 1) / target
        MediaIn(m.doc_id, Iterator.range(0, n, step).map(m.payload).toArray)
      }
    }
  }

  case class Embedded(doc_id: Long, embedding: Array[Float])

  /** Deterministic fake feature extractor: payload bytes → `dim`-float
    * vector via a rolling byte histogram-ish mix. STUB for a real vision
    * encoder; the contract (binary in, dense `array<float>` out,
    * partition-batched so a real model would amortize per-batch model
    * load) is the production shape. Output feeds `sim.Similarity`
    * unchanged — multimodal retrieval end-to-end.
    */
  def fakeEmbed(spark: SparkSession, media: DataFrame, dim: Int = 16): Dataset[Embedded] = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      // per-partition "model load" would happen here
      it.map { m =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < m.payload.length) {
          val b = m.payload(i) & 0xff
          v(i % dim) += (b * (1 + (i / dim) % 3)).toFloat
          i += 1
        }
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum).max(1e-9)
        Embedded(m.doc_id, v.map(x => (x / norm).toFloat))
      }
    }
  }

  case class EmbeddedInt(doc_id: Long, embedding: Array[Long])

  /** INTEGER fake embedding: the same byte accumulation as [[fakeEmbed]]
    * but WITHOUT the float normalization — every component is an exact
    * non-negative integer (bounded by 3·255·payload_len, far inside the
    * 2^53 double-exact range for any realistic document). Cosine is
    * scale-invariant, so skipping the normalization changes no ranking;
    * what it buys is cross-engine reproducibility: integer-valued
    * vectors make every downstream dot product an EXACT integer (sum
    * order irrelevant), which is what lets the exact-integer IVF path
    * (x20i) put k-means centroid assignment under a byte-identical
    * DuckDB oracle.
    */
  def fakeEmbedInt(spark: SparkSession, media: DataFrame,
                   dim: Int = 16): Dataset[EmbeddedInt] = {
    import spark.implicits._
    media.as[MediaIn].mapPartitions { it =>
      it.map { m =>
        val v = new Array[Long](dim)
        var i = 0
        while (i < m.payload.length) {
          val b = m.payload(i) & 0xff
          v(i % dim) += b * (1 + (i / dim) % 3)
          i += 1
        }
        EmbeddedInt(m.doc_id, v)
      }
    }
  }
}
