package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata
  * structs; feature extraction runs as partition-batched typed transforms
  * (the Scala analogue of a batched pandas UDF — one decoder instance per
  * partition, rows streamed through it).
  *
  * The container has no image/audio codecs, so the features are honest
  * BYTE-LEVEL signal computable on any payload: container sniffing from
  * magic numbers (the real first step of any media pipeline), byte mean,
  * Shannon byte entropy (compressed/encrypted media ≈ 8 bits/byte, text
  * ≈ 4-5), and a normalized 8-bucket byte histogram as the feature
  * vector. A codec-backed decoder drops in by replacing
  * [[byteFeatures]]; the schema, batching shape and partitioning are the
  * production shape already.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 byte_mean: Double, byte_entropy: Double,
                                 sniffed_kind: String, feature: Array[Float])

  /** Deterministic synthetic media table (payload = seeded pseudo-bytes):
    * stands in for a real binary source at test scale. */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n).select(
        col("id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("id"), lit(3)) + 1).cast("int")).as("kind"),
        // payload: 64..319 deterministic bytes derived from xxhash64 chunks
        unhex(concat_ws("", transform(
          sequence(lit(0), pmod(xxhash64(lit(seed), col("id")), lit(16)) + 3),
          i => lpad(hex(abs(xxhash64(lit(seed), col("id"), i))), 16, "0"))))
          .as("payload"),
        struct(
          (pmod(xxhash64(lit(seed), col("id"), lit("w")), lit(1920)) + 1).cast("int").as("width"),
          (pmod(xxhash64(lit(seed), col("id"), lit("h")), lit(1080)) + 1).cast("int").as("height"),
          lit(16000).as("sampleRate"),
          (pmod(xxhash64(lit(seed), col("id"), lit("d")), lit(60000)) + 1).as("durationMs"))
          .as("meta"))
      .as[MediaRow]
  }

  /** Container sniffing from magic numbers — real, codec-free, the first
    * dispatch step of any media ingest path. */
  private[graft] def sniffKind(b: Array[Byte]): String = {
    @inline def at(i: Int): Int = b(i) & 0xFF
    if (b.length >= 8 && at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (b.length >= 3 && at(0) == 0xFF && at(1) == 0xD8 && at(2) == 0xFF) "jpeg"
    else if (b.length >= 4 && at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "gif"
    else if (b.length >= 4 && at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F') "riff"
    else if (b.length >= 4 && at(0) == '%' && at(1) == 'P' && at(2) == 'D' && at(3) == 'F') "pdf"
    else if (b.length >= 3 && at(0) == 'I' && at(1) == 'D' && at(2) == '3') "mp3"
    else if (b.length >= 8 && at(4) == 'f' && at(5) == 't' && at(6) == 'y' && at(7) == 'p') "mp4"
    else "unknown"
  }

  /** Byte-level decode: (mean, entropy, 8-bucket normalized histogram).
    * Entropy is Shannon over the 256-value byte distribution, in bits
    * (0 for constant payloads, 8 for uniform). */
  private[graft] def byteFeatures(b: Array[Byte]): (Double, Double, Array[Float]) = {
    if (b.isEmpty) return (0.0, 0.0, new Array[Float](8))
    val hist = new Array[Long](256)
    var sum = 0L
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xFF
      hist(v) += 1
      sum += v
      i += 1
    }
    val n = b.length.toDouble
    var entropy = 0.0
    var j = 0
    while (j < 256) {
      if (hist(j) > 0) {
        val p = hist(j) / n
        entropy -= p * (math.log(p) / math.log(2.0))
      }
      j += 1
    }
    val feat = new Array[Float](8)
    j = 0
    while (j < 256) { feat(j >> 5) += (hist(j) / n).toFloat; j += 1 }
    (sum / n, entropy, feat)
  }

  /** Partition-batched feature extraction: one decoder instance per
    * partition, rows streamed through it. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init (a codec handle would be created here, once)
      rows.map { r =>
        val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
        val (mean, entropy, feat) = byteFeatures(bytes)
        MediaFeatures(r.media_id, r.kind, bytes.length.toLong, mean, entropy,
          sniffKind(bytes), feat)
      }
    }
  }

  /** Frame-sampling plan for video rows: one output row per sampled frame
    * index (every `everyMs` ms of duration) — pure relational explode, the
    * decode of each frame is again the per-partition decoder boundary. */
  def frameSamplePlan(media: Dataset[MediaRow], everyMs: Long): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), col("meta.durationMs").as("durationMs"),
        explode(sequence(lit(0L), col("meta.durationMs") - 1, lit(everyMs)))
          .as("frame_ts_ms"))
  }
}
