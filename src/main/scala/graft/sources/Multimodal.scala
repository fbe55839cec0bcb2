package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata
  * structs; feature extraction runs as partition-batched typed transforms.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): `decodeStub` produces deterministic fake features from the
  * payload bytes. Everything around it — schema, batching shape,
  * partitioning, the typed Dataset surface — is real and tested, so a real
  * decoder drops in by replacing one function.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 byte_mean: Double, feature: Array[Float])

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

  /** STUB decode: deterministic fake "decoded features" from raw bytes.
    * Replace with a real codec (JNI/ffmpeg/imageio) on a real cluster —
    * the signature (one batch of rows in, one batch out, executed
    * per-partition) is the production shape. */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    // ??? <- real decoder goes here; deterministic fake below keeps the
    // pipeline testable offline.
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Partition-batched feature extraction (the Scala analogue of a batched
    * pandas UDF): one decoder instance per partition, rows streamed
    * through it. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init (decoder handle would be created here, once)
      rows.map { r =>
        val bytes = if (r.payload == null) Array.emptyByteArray else r.payload
        val mean =
          if (bytes.isEmpty) 0.0
          else bytes.map(b => (b & 0xFF).toDouble).sum / bytes.length
        MediaFeatures(r.media_id, r.kind, bytes.length.toLong, mean, decodeStub(bytes))
      }
    }
  }

  /** Frame-sampling plan for video rows: one output row per sampled frame
    * index (every `everyMs` ms of duration) — pure relational explode, the
    * decode of each frame is again the stub boundary. */
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
