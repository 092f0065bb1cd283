package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for LLM training-data pipelines.
  *
  * Media (image/audio/video) are opaque `binary` columns plus typed JSON
  * metadata; decode / feature-extract / frame-sample run per-partition so
  * a real decoder library would be initialized once per partition, not
  * per row. The decode kernels themselves are STUBBED with deterministic
  * fakes (no image/audio libraries in this environment) — the Spark-side
  * contract (schema, batch shape, partitioning, null handling) is real
  * and tested, and swapping a stub for a JNI/FFI decoder changes no plan.
  *
  * Scale notes: media rows are large and skewed — repartition by byte
  * budget, not row count ([[repartitionByBytes]]); frame sampling is a
  * flatMap (narrow, no shuffle); extracted features are small and flow
  * into the ANN/dedup operators in [[graft.index.Ann]]/[[graft.dedup.Dedup]].
  */
object Multimodal {

  /** One media row: id, modality discriminator, raw bytes, JSON metadata. */
  final case class MediaRecord(media_id: Long, modality: String, content: Array[Byte], meta: String)

  /** Decoded descriptor (what a real decoder would return). */
  final case class Decoded(media_id: Long, modality: String, width: Int, height: Int,
      n_frames: Int, n_bytes: Long)

  /** Extracted feature row — embedding ready for the ANN operators. */
  final case class MediaFeature(media_id: Long, embedding: Array[Float])

  /** One sampled frame of a video row. */
  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** STUB — deterministic fake decode. A real implementation calls an
    * image/audio decoder here (per-partition init amortized by
    * mapPartitions); this fake derives plausible dimensions from a
    * stable byte hash so tests are reproducible. */
  private def decodeStub(r: MediaRecord): Decoded = {
    val h = java.util.Arrays.hashCode(r.content)
    val w = 64 + math.abs(h % 960)
    val ht = 64 + math.abs((h / 960) % 960)
    val frames = r.modality match {
      case "video" => 1 + math.abs(h % 240)
      case _       => 1
    }
    Decoded(r.media_id, r.modality, w, ht, frames, r.content.length.toLong)
  }

  /** Decode every media row into its descriptor. mapPartitions so a real
    * decoder initializes once per partition. */
  def decode(media: Dataset[MediaRecord]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: val decoder = NativeDecoder.acquire() — once per partition
      it.map(decodeStub)
    }
  }

  /** STUB — deterministic fake feature extraction: bytes → unit-norm
    * float vector derived from rolling byte hashes. A real implementation
    * batches rows through a vision/audio encoder model here. */
  def extractFeatures(media: Dataset[MediaRecord], dim: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val v = new Array[Float](dim)
        var h = 1125899906842597L
        var i = 0
        while (i < r.content.length) {
          h = h * 31 + (r.content(i) & 0xff)
          v(i % dim) += ((h % 1000).toFloat / 1000f)
          i += 1
        }
        val n = math.sqrt(v.map(x => x.toDouble * x).sum)
        MediaFeature(r.media_id, if (n == 0) v else v.map(x => (x / n).toFloat))
      }
    }
  }

  /** Sample up to `maxFrames` evenly spaced frames per video row — a
    * narrow flatMap; non-video rows pass through as a single frame. The
    * frame-bytes slice is the stub for a real frame decoder. */
  def sampleFrames(media: Dataset[MediaRecord], maxFrames: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val d = decodeStub(r)
      val n = math.min(maxFrames, d.n_frames)
      (0 until n).map { k =>
        val idx = if (n == 1) 0 else (k.toLong * (d.n_frames - 1) / (n - 1)).toInt
        val sliceLen = math.max(1, r.content.length / math.max(1, d.n_frames))
        val off = math.min(r.content.length - 1, idx * sliceLen).max(0)
        Frame(r.media_id, idx,
          java.util.Arrays.copyOfRange(r.content, off, math.min(r.content.length, off + sliceLen)))
      }
    }
  }

  /** Typed metadata access over the JSON `meta` column. */
  def withMeta(df: DataFrame, fields: Map[String, String]): DataFrame =
    fields.foldLeft(df) { case (acc, (name, jsonPath)) =>
      acc.withColumn(name, get_json_object(col("meta"), jsonPath))
    }

  /** Media rows are large and size-skewed: repartition targeting
    * `targetBytes` per partition using the actual blob sizes, so one
    * partition of 4K-thumbnails and one of 4GB-videos get comparable
    * work. (At 100 TB this is the difference between a balanced stage
    * and a straggler.) */
  def repartitionByBytes(df: DataFrame, targetBytes: Long = 128L << 20): DataFrame = {
    val total = df.agg(sum(length(col("content")))).head().getLong(0)
    val parts = math.max(1, (total / targetBytes).toInt)
    df.repartition(parts, col("media_id"))
  }
}
