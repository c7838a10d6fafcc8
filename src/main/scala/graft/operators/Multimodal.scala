package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side machinery — schema, partitioning, batch iteration shape,
  * deterministic synthetic media generator — is real and tested. The actual
  * codec step is STUBBED (this container has no image/audio libraries):
  * [[decodeStub]] produces a deterministic fake decode from the content
  * hash, clearly marked. Swap `decodeStub` for a real JNI/ffmpeg/ImageIO
  * call (or, PySpark-side, an `mapInPandas` batch UDF with the identical
  * row contract) and nothing else changes.
  */
object Multimodal {

  /** Typed media row: binary payload + metadata (the "Iceberg-style" layout
    * where bytes are an opaque column and all pushdown-able facts live in
    * typed metadata columns — filters on kind/width/duration prune without
    * touching bytes, and Parquet only materializes `bytes` for surviving
    * rows). */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      bytes: Array[Byte],
      width: Int, // image/video; -1 otherwise
      height: Int,
      duration_ms: Long, // audio/video; -1 for image
      codec: String)

  final case class MediaFeature(
      media_id: Long,
      kind: String,
      feature: Array[Float], // embedding-shaped decode output
      decode_ok: Boolean)

  final case class FrameSample(
      media_id: Long,
      frame_idx: Int,
      frame_ts_ms: Long,
      frame_bytes: Array[Byte])

  /** Deterministic synthetic media table (no external data): payload bytes
    * are a pure function of (seed, id), metadata plausible per kind. */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val rng = new scala.util.Random(seed ^ (id * 0x9E3779B97F4A7C15L))
      val kind = Seq("image", "audio", "video")((id % 3).toInt)
      val size = 256 + rng.nextInt(1024)
      val bytes = new Array[Byte](size); rng.nextBytes(bytes)
      kind match {
        case "image" => MediaRow(id, kind, bytes, 64 + rng.nextInt(1920), 64 + rng.nextInt(1080), -1L, "png")
        case "audio" => MediaRow(id, kind, bytes, -1, -1, 1000L + rng.nextInt(600000), "opus")
        case _       => MediaRow(id, kind, bytes, 320 + rng.nextInt(1600), 240 + rng.nextInt(840), 1000L + rng.nextInt(120000), "h264")
      }
    }
  }

  /** ??? STUB — stands in for the real codec. Deterministic fake "decode":
    * a 16-dim feature folded from the byte content, so tests are stable and
    * the full pipeline (partitioning → batch iterate → feature column) is
    * exercised end-to-end. A real implementation replaces ONLY this
    * function body (e.g. ImageIO.read / ffmpeg frame grab → CNN features).
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      out(i % 16) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    out.map(v => v / math.max(bytes.length / 16, 1).toFloat)
  }

  /** Batch feature extraction: one pass per partition, constant memory —
    * the mapPartitions iterator is the JVM analogue of a pandas-batch UDF
    * (same contract: stream of rows in, stream of feature rows out; never
    * materializes a partition). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val ok = m.bytes != null && m.bytes.nonEmpty
        MediaFeature(m.media_id, m.kind, if (ok) decodeStub(m.bytes) else Array.empty[Float], ok)
      }
    }
  }

  /** Frame sampling for video rows: every `everyMs` milliseconds, emit a
    * (frame_idx, ts, bytes) row. Frame "decode" is the stub (slice of the
    * source bytes); the explode/partitioning shape is the real contract. */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000L, maxFrames: Int = 32): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = math.min((m.duration_ms / everyMs).toInt, maxFrames)
      (0 until n).map { f =>
        // STUB frame grab: deterministic byte slice standing in for a real
        // ffmpeg -ss seek + decode
        val start = (f * 31) % math.max(m.bytes.length - 16, 1)
        FrameSample(m.media_id, f, f * everyMs, m.bytes.slice(start, start + 16))
      }
    }
  }

  /** "Resize" metadata transform (stub: real impl re-encodes bytes): typed
    * column math only — shows the pushdown-friendly metadata pattern. */
  def resizePlan(df: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxDim.toDouble) / greatest(col("width"), col("height")))
    df.withColumn("target_width", (col("width") * scale).cast("int"))
      .withColumn("target_height", (col("height") * scale).cast("int"))
  }
}
