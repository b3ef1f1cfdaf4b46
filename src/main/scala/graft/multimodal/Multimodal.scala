package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata
  * structs; decode / feature-extract / resize / frame-sample run as
  * per-partition batch transforms (`mapPartitions` over a typed Dataset —
  * the JVM analogue of `mapInPandas` batch iteration: one iterator pull per
  * partition, bounded memory, partition-preserving).
  *
  * DECODERS ARE DETERMINISTIC STUBS — the container has no image/audio
  * codecs. The stub derives pseudo-metadata and a 16-bin byte histogram
  * from the payload bytes, so the Spark-side contract (schema, batch
  * iteration, partitioning, feature shapes) is real and testable; swapping
  * in a real codec only replaces the pure `decodeBytes` function.
  */
object Multimodal {

  final case class MediaRow(id: Long, payload: Array[Byte])
  final case class ImageFeatures(
      id: Long, width: Int, height: Int, channels: Int,
      histogram: Array[Double])
  final case class FrameSample(id: Long, frameIndex: Int, features: Array[Double])

  /** STUB decode: pseudo width/height from a modular rolling hash of the
    * bytes (pure mod-2^31−1 arithmetic so any engine can replicate it for
    * differential testing), 16-bin byte-value histogram as the
    * "embedding". Deterministic. */
  def decodeBytes(payload: Array[Byte]): (Int, Int, Int, Array[Double]) = {
    var h = 17L
    var i = 0
    while (i < payload.length) {
      h = (31 * h + (payload(i) & 0xff)) % 2147483647L
      i += 1
    }
    val width = 16 + (h % 625).toInt
    val height = 16 + ((h / 625) % 465).toInt
    val hist = new Array[Double](16)
    payload.foreach(b => hist((b & 0xff) >> 4) += 1)
    val n = math.max(1, payload.length)
    (width, height, 3, hist.map(_ / n))
  }

  /** Decode a binary column into typed image features — one batch pass per
    * partition, no shuffle; schema is a flat struct + fixed-length feature
    * array (columnar-friendly at any scale). */
  def decodeImages(df: DataFrame, idCol: String, binCol: String): Dataset[ImageFeatures] = {
    val ds = df.select(col(idCol).cast("long").as("id"),
      col(binCol).cast("binary").as("payload")).as(Encoders.product[MediaRow])
    ds.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c, hist) = decodeBytes(r.payload)
        ImageFeatures(r.id, w, h, c, hist)
      }
    }(Encoders.product[ImageFeatures])
  }

  /** STUB video frame-sampling: treat the payload as `fps`-chunked frames;
    * emit one feature row per sampled frame (every `stride`-th chunk). The
    * explode happens partition-locally — output is narrow (id, frame,
    * features), never the raw payload. */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int = 256, stride: Int = 4): Dataset[FrameSample] = {
    val ds = df.select(col(idCol).cast("long").as("id"),
      col(binCol).cast("binary").as("payload")).as(Encoders.product[MediaRow])
    ds.mapPartitions { rows =>
      rows.flatMap { r =>
        r.payload.grouped(frameBytes).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (chunk, idx) =>
            FrameSample(r.id, idx, decodeBytes(chunk)._4)
          }
      }
    }(Encoders.product[FrameSample])
  }

  /** Audio stub: duration estimate from byte length at a nominal bitrate —
    * a pure column expression (no decode needed for metadata-level ops). */
  def audioDurationSec(binCol: org.apache.spark.sql.Column,
      bytesPerSec: Int = 16000): org.apache.spark.sql.Column =
    octet_length(binCol).cast("double") / bytesPerSec
}
