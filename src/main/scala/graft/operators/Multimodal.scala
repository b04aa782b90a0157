package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a distributed decode/feature-extract
  * stage.
  *
  * The Spark-side plumbing (schema, partitioning, batch shape, typed
  * records) is real and tested; the codec itself is STUBBED with a
  * deterministic fake because media libraries are not available in this
  * environment — swap [[Multimodal.fakeDecode]] for a real decoder (JNI
  * ffmpeg / javax.imageio / an ONNX feature extractor) without touching
  * any of the plumbing.
  *
  * Scale design: decode runs as `mapPartitions` over rows pre-shuffled by
  * `media_id` (`repartition`) so the expensive stage parallelizes evenly
  * and any decoder state (codec contexts, model weights) is initialized
  * once per partition, not per row.
  */
object Multimodal {

  /** An opaque media payload + typed metadata. */
  case class MediaRecord(
      media_id: Long,
      kind: String,             // e.g. image/jpeg, audio/wav — here: source tag
      bytes: Array[Byte],       // opaque payload
      declared_len: Long)       // metadata that travels with the blob

  /** Extracted features for one media item. */
  case class MediaFeature(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,           // payload checksum (decoder-independent)
      feat: Array[Float])       // feature vector from the (stubbed) decoder

  /** Build a media table from the documents table: payload = UTF-8 bytes
    * of the text (a deterministic stand-in for real image/audio blobs),
    * kind = source, metadata = declared char length. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").cast("long").as("media_id"),
      col("source").as("kind"),
      col("text").cast("binary").as("bytes"),
      col("n_chars").cast("long").as("declared_len"))

  /** STUB decoder — deterministic fake feature extraction.
    * A real implementation would decode the payload (image decode, audio
    * PCM, video frame-sample) and run a feature extractor; this fake
    * derives an 8-dim feature from the raw bytes so tests are exact. */
  private[operators] def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val feat = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      feat(i % 8) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    feat
  }

  /** One sampled frame of a (fake) video payload. */
  case class FrameSample(media_id: Long, frame_index: Int, frame_bytes: Array[Byte])

  /** STUB resize: a real implementation decodes, scales to
    * `targetW`×`targetH` and re-encodes; the stub deterministically
    * truncates/strides the payload to a size proportional to the target
    * area so tests are exact. The plumbing — binary→binary projection
    * with updated metadata, no driver involvement — is the real shape. */
  def resize(media: DataFrame, targetW: Int, targetH: Int)
      (implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    val targetLen = math.max(1, targetW * targetH / 64)
    media.as[MediaRecord].map { r =>
      val out = new Array[Byte](math.min(targetLen, math.max(1, r.bytes.length)))
      val stride = math.max(1, r.bytes.length / math.max(1, out.length))
      var i = 0
      while (i < out.length && i * stride < r.bytes.length) {
        out(i) = r.bytes(i * stride); i += 1
      }
      MediaRecord(r.media_id, r.kind, out, out.length.toLong)
    }
  }

  /** STUB frame sampling: a real implementation seeks keyframes in a
    * video container; the stub slices the payload into `nFrames` evenly
    * spaced windows (flatMap — one row per sampled frame, the row
    * explosion shape a real sampler has). */
  def sampleFrames(media: DataFrame, nFrames: Int)
      (implicit spark: SparkSession): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { r =>
      val n = math.min(nFrames, math.max(1, r.bytes.length))
      (0 until n).map { f =>
        val start = (r.bytes.length.toLong * f / n).toInt
        val end = (r.bytes.length.toLong * (f + 1) / n).toInt
        FrameSample(r.media_id, f, r.bytes.slice(start, math.max(start + 1, end)))
      }
    }
  }

  /** Distributed decode/feature-extract over the media table.
    *
    * `parallelism` controls the repartition ahead of the heavy stage —
    * at 100 TB this is the knob that spreads decode across the cluster
    * independent of upstream file layout. */
  def decodeFeatures(media: DataFrame, parallelism: Int)
      (implicit spark: SparkSession): Dataset[MediaFeature] = {
    import spark.implicits._
    media.as[MediaRecord]
      .repartition(parallelism, col("media_id"))
      .mapPartitions { rows =>
        // Per-partition decoder init would go here (codec ctx, model).
        rows.map { r =>
          val sum = {
            var s = 0L; var i = 0
            while (i < r.bytes.length) { s += (r.bytes(i) & 0xff); i += 1 }
            s
          }
          MediaFeature(r.media_id, r.kind, r.bytes.length.toLong, sum,
            fakeDecode(r.bytes))
        }
      }
  }
}
