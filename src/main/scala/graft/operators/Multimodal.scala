package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side machinery — schema, partitioning, batch iteration shape,
  * deterministic synthetic media generator — is real and tested. The AUDIO
  * branch decodes REAL bytes end-to-end: [[WavCodec]] is a pure-JVM
  * RIFF/WAVE PCM parser behind the pluggable [[AudioCodec]] seam, and
  * [[extractAudioFeatures]] runs it distributed (oracle-checked —
  * `q_wav_features` re-derives every feature in SQL). The image/video
  * codec step remains STUBBED (this container has no image libraries):
  * [[decodeStub]] produces a deterministic fake decode from the content
  * hash, clearly marked. Swap `decodeStub` for a real JNI/ffmpeg/ImageIO
  * call (or, PySpark-side, an `mapInPandas` batch UDF with the identical
  * row contract) — exactly as WavCodec swaps in for audio — and nothing
  * else changes.
  */
object Multimodal {

  // ------------------------------------------------------------ audio codec

  /** Decoded PCM audio — the codec-neutral decode result. `samples` holds
    * interleaved channel samples widened to Int (16-bit PCM fits exactly;
    * a 24/32-bit codec would reuse the same shape). */
  final case class DecodedAudio(
      sampleRate: Int, channels: Int, bitsPerSample: Int, samples: Array[Int]) {
    def nFrames: Long = if (channels == 0) 0L else samples.length.toLong / channels
    def durationMs: Long = if (sampleRate == 0) 0L else nFrames * 1000L / sampleRate
  }

  /** The pluggable codec seam: swap implementations (ffmpeg/JNI, another
    * container format) without touching the distributed plumbing.
    * `decode` returns None for unparseable bytes — downstream rows carry
    * `decode_ok = false` instead of failing the job (corrupt media is data,
    * not an error, at corpus scale). */
  trait AudioCodec extends Serializable {
    def name: String
    def decode(bytes: Array[Byte]): Option[DecodedAudio]
  }

  /** Pure-JVM (stdlib-only) RIFF/WAVE PCM 16-bit codec: canonical 44-byte
    * header + s16le samples on encode; a proper chunk walk on decode (extra
    * chunks like LIST/INFO are skipped, word-aligned per the RIFF spec), so
    * real-world WAV files parse, not just our own output. Strictly
    * validating: anything that is not PCM-16 WAVE returns None. */
  object WavCodec extends AudioCodec {
    val name = "wav"

    private def u16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    def decode(bytes: Array[Byte]): Option[DecodedAudio] = {
      if (bytes == null || bytes.length < 44) return None
      if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
      var fmt: Option[(Int, Int, Int)] = None // (channels, sampleRate, bits)
      var o = 12
      while (o + 8 <= bytes.length) {
        val id = tag(bytes, o)
        val size = u32(bytes, o + 4)
        if (size < 0 || o + 8 + size > bytes.length) return None
        val body = o + 8
        id match {
          case "fmt " =>
            if (size < 16) return None
            val audioFormat = u16(bytes, body)
            val channels = u16(bytes, body + 2)
            val rate = u32(bytes, body + 4)
            val bits = u16(bytes, body + 14)
            // PCM integer, 16-bit only — this codec's honest envelope
            if (audioFormat != 1 || bits != 16 || channels < 1 || rate <= 0 ||
              rate > Int.MaxValue) return None
            fmt = Some((channels, rate.toInt, bits))
          case "data" =>
            val f = fmt.getOrElse(return None) // data before fmt: malformed
            val n = (size / 2).toInt
            // frames must align to whole interleaved sample groups
            if (size % 2 != 0 || n % f._1 != 0) return None
            val samples = new Array[Int](n)
            var i = 0
            while (i < n) {
              // s16le: sign via Short narrowing
              samples(i) = ((bytes(body + 2 * i) & 0xFF) |
                (bytes(body + 2 * i + 1) << 8)).toShort.toInt
              i += 1
            }
            return Some(DecodedAudio(f._2, f._1, f._3, samples))
          case _ => () // LIST/INFO/fact/...: skip
        }
        o = body + size.toInt + (size.toInt & 1) // RIFF chunks are word-aligned
      }
      None // no data chunk
    }

    /** Canonical-form encoder (44-byte header, no extra chunks). `samples`
      * are interleaved s16 values in [-32768, 32767]; out-of-range input is
      * a caller bug and raises. */
    def encode(samples: Array[Int], sampleRate: Int, channels: Int): Array[Byte] = {
      require(channels >= 1 && sampleRate > 0 && samples.length % channels == 0,
        s"bad PCM shape: $channels channels, $sampleRate Hz, ${samples.length} samples")
      val dataSize = samples.length * 2
      val out = new Array[Byte](44 + dataSize)
      def putTag(o: Int, s: String): Unit = {
        val a = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        System.arraycopy(a, 0, out, o, 4)
      }
      def put16(o: Int, v: Int): Unit = {
        out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
      }
      def put32(o: Int, v: Long): Unit = {
        var i = 0
        while (i < 4) { out(o + i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 }
      }
      putTag(0, "RIFF"); put32(4, 36L + dataSize); putTag(8, "WAVE")
      putTag(12, "fmt "); put32(16, 16L); put16(20, 1); put16(22, channels)
      put32(24, sampleRate.toLong); put32(28, sampleRate.toLong * channels * 2)
      put16(32, channels * 2); put16(34, 16)
      putTag(36, "data"); put32(40, dataSize.toLong)
      var i = 0
      while (i < samples.length) {
        val s = samples(i)
        require(s >= Short.MinValue && s <= Short.MaxValue, s"sample out of s16 range: $s")
        put16(44 + 2 * i, s & 0xFFFF)
        i += 1
      }
      out
    }
  }

  /** Deterministic synthetic PCM waveform: sample i of media `id` is
    * ((i·2654435761 + id·40503) mod 65536) − 32768 — pure integer
    * arithmetic any engine reproduces exactly (the q_wav_features oracle
    * recomputes it in SQL), full s16 dynamic range, no trig/floats. */
  def syntheticWavSamples(id: Long, n: Int): Array[Int] =
    Array.tabulate(n)(i =>
      (((i.toLong * 2654435761L + id * 40503L) % 65536L) - 32768L).toInt)

  /** Integer audio features of one media row — every field is exact
    * integer arithmetic over the decoded samples, so a SQL oracle
    * re-derives them bit-for-bit. Failed decodes carry −1 sentinels with
    * `decode_ok = false` (corrupt media is data, not a job error). */
  final case class AudioFeature(
      media_id: Long, decode_ok: Boolean, sample_rate: Int, channels: Int,
      bits: Int, n_frames: Long, duration_ms: Long,
      peak_abs: Long, sum_squares: Long, checksum: Long)

  /** Distributed feature extraction over a binary audio column: decode with
    * `codec`, reduce each row's samples to exact integer aggregates. Pure
    * per-row work — embarrassingly parallel, no shuffle, constant memory
    * per row (samples never leave the task). */
  def extractAudioFeatures(media: DataFrame, idCol: String, bytesCol: String,
      codec: AudioCodec = WavCodec): Dataset[AudioFeature] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        codec.decode(bytes) match {
          case Some(d) =>
            var peak = 0L; var ss = 0L; var cs = 0L
            var i = 0
            while (i < d.samples.length) {
              val s = d.samples(i).toLong
              val a = math.abs(s)
              if (a > peak) peak = a
              ss += s * s; cs += s
              i += 1
            }
            AudioFeature(id, decode_ok = true, d.sampleRate, d.channels,
              d.bitsPerSample, d.nFrames, d.durationMs, peak, ss, cs)
          case None =>
            AudioFeature(id, decode_ok = false, -1, -1, -1, -1L, -1L, -1L, -1L, -1L)
        }
      }
  }

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
