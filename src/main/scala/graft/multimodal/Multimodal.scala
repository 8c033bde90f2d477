package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The Spark-side shape is real and tested: schema (binary payload + struct
  * metadata), partition-friendly batch iteration via mapPartitions over a
  * typed Dataset, and outputs that feed straight into VectorOps (embedding
  * arrays) — this is the 100 TB layout where payloads live in parquet binary
  * columns co-partitioned with their metadata.
  *
  * The actual media decoding is STUBBED: this container ships no
  * image/audio codecs, so [[StubCodec]] derives deterministic fake features
  * from the bytes. Swap `StubCodec` for a JNI/FFmpeg/ImageIO-backed codec in
  * production — every signature stays the same.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRate: Int)
  final case class MediaRow(media_id: Long, meta: MediaMeta,
      payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      checksum: String, features: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** ??? in spirit: a clearly-marked deterministic fake decoder. Real
    * implementation decodes pixels/samples; this hashes byte windows so the
    * pipeline (schema, partitioning, batch shape) is exercised end-to-end. */
  object StubCodec {
    val FeatureDim = 16
    def decodeFeatures(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
    def sha256(payload: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(payload).map("%02x".format(_)).mkString
  }

  /** Build a media table from the documents fixture: payload = UTF-8 bytes
    * standing in for encoded media; metadata typed per kind. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, n) =>
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        MediaRow(id, MediaMeta(kind, (n % 640).toInt, (n % 480).toInt,
          if (kind == "audio") 16000 else 0), text.getBytes("UTF-8"))
      }
  }

  /** Decode + feature-extract, batched per partition (the mapInPandas batch
    * shape: one iterator pass per partition, no per-row task overhead). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would initialize the codec once here
      it.map { m =>
        MediaFeatures(m.media_id, m.meta.kind, m.payload.length,
          StubCodec.sha256(m.payload), StubCodec.decodeFeatures(m.payload))
      }
    }
  }

  /** Frame sampling: every `stride` bytes yields a fixed-size window —
    * the video keyframe-sampling shape (real slicing, stubbed decode). */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int = 32,
      stride: Int = 64): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.payload.grouped(stride).zipWithIndex.collect {
        case (w, idx) if w.length >= frameSize =>
          Frame(m.media_id, idx, w.take(frameSize))
      }
    }
  }

  /** The features as a DataFrame with an embedding column compatible with
    * VectorOps (array<float>), demonstrating the media → embedding → ANN
    * hand-off. */
  def featureFrame(spark: SparkSession, sfDir: String): DataFrame =
    extractFeatures(mediaTable(spark, sfDir)).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("checksum"),
        col("features").as("embedding"))
}
