package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side machinery — schema, partitioning, batch iteration shape,
  * deterministic synthetic media generator — is real and tested, and ALL
  * THREE modalities now decode REAL bytes end-to-end behind pluggable
  * codec seams, one public container format each, pure-JVM stdlib only:
  *   - audio: [[WavCodec]] (RIFF/WAVE PCM-16, proper chunk walk) behind
  *     [[AudioCodec]]; `q_wav_features` re-derives every feature in SQL;
  *   - image: [[BmpCodec]] (BMP 24-bit BI_RGB, bottom-up/top-down +
  *     row padding) AND the compressed [[PngCodec]] (8-bit truecolor PNG
  *     over `java.util.zip` — CRC-checked chunk walk, zlib inflate, all
  *     five scanline filters) behind [[ImageCodec]], dispatched for mixed
  *     corpora by [[SniffImageCodec]], plus exact nearest-neighbor
  *     [[resizeNearest]]; `q_bmp_features` / `q_bmp_resize` /
  *     `q_png_features` oracles;
  *   - video: [[AviCodec]] (RIFF AVI, uncompressed 'DIB ' frames, rec
  *     groups) behind [[VideoCodec]] with real [[sampleVideoFrames]];
  *     `q_avi_frames` oracle.
  * [[PngCodec]] proves the compressed-codec claim in-repo; further formats
  * (JPEG/Opus/H.264) swap in at the same seams — a JNI/ffmpeg/ImageIO
  * decode replaces ONE function and nothing else changes; [[decodeStub]]
  * remains the documented placeholder for those branches only.
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

  // ------------------------------------------------------------ image codec

  /** Decoded raster — codec-neutral: `pixels` is row-major TOP-DOWN packed
    * 0xRRGGBB (one Int per pixel), regardless of the container's row order.
    * Every downstream consumer (features, resize, re-encode) sees one
    * canonical orientation; the codec owns the flip. */
  final case class DecodedImage(width: Int, height: Int, pixels: Array[Int]) {
    require(pixels.length == width * height,
      s"pixel buffer ${pixels.length} != ${width}x$height")
    def apply(x: Int, y: Int): Int = pixels(y * width + x)
  }

  /** The image half of the codec seam — same contract as [[AudioCodec]]:
    * None for unparseable bytes (corrupt media is data, not a job error). */
  trait ImageCodec extends Serializable {
    def name: String
    def decode(bytes: Array[Byte]): Option[DecodedImage]
  }

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def i32le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)

  /** Decode a 24-bit uncompressed DIB pixel array (the payload shared by BMP
    * files and AVI 'DIB ' video frames): rows padded to 4-byte boundaries,
    * stored bottom-up when `height > 0`, top-down when `height < 0`
    * (both signs are in the BITMAPINFOHEADER spec). Returns canonical
    * top-down packed pixels, or None if `bytes` can't hold the raster. */
  private[operators] def decodeDib24(
      bytes: Array[Byte], off: Int, width: Int, height: Int): Option[DecodedImage] = {
    if (width <= 0 || height == 0 || height == Int.MinValue) return None
    val h = math.abs(height)
    val bottomUp = height > 0
    val stride = ((width * 3 + 3) / 4) * 4
    // guard the full multiply in Long: a hostile header must not overflow
    if (stride.toLong * h + off > bytes.length || width.toLong * h > Int.MaxValue / 2)
      return None
    val px = new Array[Int](width * h)
    var y = 0
    while (y < h) {
      val srcRow = if (bottomUp) h - 1 - y else y
      var x = 0
      var o = off + srcRow * stride
      val rowBase = y * width
      while (x < width) {
        // DIB byte order is B, G, R
        px(rowBase + x) = ((bytes(o + 2) & 0xFF) << 16) |
          ((bytes(o + 1) & 0xFF) << 8) | (bytes(o) & 0xFF)
        x += 1; o += 3
      }
      y += 1
    }
    Some(DecodedImage(width, h, px))
  }

  /** Encode canonical top-down pixels as a bottom-up padded 24-bit DIB
    * raster (no headers — BMP and AVI wrap it differently). */
  private[operators] def encodeDib24(img: DecodedImage): Array[Byte] = {
    val stride = ((img.width * 3 + 3) / 4) * 4
    val out = new Array[Byte](stride * img.height) // padding bytes stay 0
    var y = 0
    while (y < img.height) {
      var x = 0
      var o = (img.height - 1 - y) * stride
      while (x < img.width) {
        val p = img(x, y)
        out(o) = (p & 0xFF).toByte            // B
        out(o + 1) = ((p >> 8) & 0xFF).toByte // G
        out(o + 2) = ((p >> 16) & 0xFF).toByte // R
        x += 1; o += 3
      }
      y += 1
    }
    out
  }

  /** Pure-JVM (stdlib-only) Windows BMP codec: BITMAPFILEHEADER (14 bytes)
    * + BITMAPINFOHEADER (40 bytes), 24-bit BI_RGB only — the honest
    * envelope, mirroring [[WavCodec]]'s PCM-16-only stance. Handles both
    * bottom-up and top-down rasters and 4-byte row padding; anything else
    * (palettes, RLE, 32-bit, V4/V5 headers) returns None. */
  object BmpCodec extends ImageCodec {
    val name = "bmp"

    def decode(bytes: Array[Byte]): Option[DecodedImage] = {
      if (bytes == null || bytes.length < 54) return None
      if (bytes(0) != 'B' || bytes(1) != 'M') return None
      val pixelOff = i32le(bytes, 10)
      val dibSize = i32le(bytes, 14)
      if (dibSize != 40) return None // BITMAPINFOHEADER only
      val width = i32le(bytes, 18)
      val height = i32le(bytes, 22)
      val planes = u16le(bytes, 26)
      val bpp = u16le(bytes, 28)
      val compression = i32le(bytes, 30)
      if (planes != 1 || bpp != 24 || compression != 0) return None
      if (pixelOff < 54 || pixelOff > bytes.length) return None
      decodeDib24(bytes, pixelOff, width, height)
    }

    /** Canonical-form encoder: 54-byte header, bottom-up raster. */
    def encode(img: DecodedImage): Array[Byte] = {
      val dib = encodeDib24(img)
      val out = new Array[Byte](54 + dib.length)
      def put16(o: Int, v: Int): Unit = {
        out(o) = (v & 0xFF).toByte; out(o + 1) = ((v >> 8) & 0xFF).toByte
      }
      def put32(o: Int, v: Int): Unit = {
        var i = 0
        while (i < 4) { out(o + i) = ((v >> (8 * i)) & 0xFF).toByte; i += 1 }
      }
      out(0) = 'B'; out(1) = 'M'
      put32(2, 54 + dib.length) // file size
      put32(10, 54) // pixel data offset
      put32(14, 40) // BITMAPINFOHEADER
      put32(18, img.width); put32(22, img.height) // positive = bottom-up
      put16(26, 1); put16(28, 24) // planes, bpp
      put32(34, dib.length) // biSizeImage
      System.arraycopy(dib, 0, out, 54, dib.length)
      out
    }
  }

  /** Pure-JVM PNG codec over `java.util.zip` — the first COMPRESSED format
    * behind the [[ImageCodec]] seam, making the "a compressed codec swaps in
    * at the same seam" claim concrete with stdlib only. Decodes 8-bit
    * truecolor (color type 2), non-interlaced PNGs: chunk walk with per-chunk
    * CRC-32 verification, multi-IDAT zlib inflate, and all five scanline
    * filters (None/Sub/Up/Average/Paeth) reversed per the PNG spec §9.
    * Anything else (palette, alpha, 16-bit, interlaced) returns None — the
    * same honest single-profile stance as [[WavCodec]]/[[BmpCodec]]. */
  object PngCodec extends ImageCodec {
    val name = "png"
    private val Sig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    private def u32be(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    def decode(bytes: Array[Byte]): Option[DecodedImage] = {
      if (bytes == null || bytes.length < Sig.length + 12) return None
      var i = 0
      while (i < Sig.length) { if (bytes(i) != Sig(i)) return None; i += 1 }
      var width = -1; var height = -1; var seenIhdr = false; var ended = false
      val idat = new java.io.ByteArrayOutputStream()
      var o = Sig.length
      while (!ended) {
        if (o + 12 > bytes.length) return None // ran out before IEND
        val len = u32be(bytes, o)
        if (len > bytes.length.toLong || o + 12 + len > bytes.length) return None
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, o + 4, 4 + len.toInt) // CRC covers type + data
        if (crc.getValue != u32be(bytes, o + 8 + len.toInt)) return None
        new String(bytes, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII) match {
          case "IHDR" =>
            if (len != 13 || seenIhdr) return None
            if (u32be(bytes, o + 8) > Int.MaxValue || u32be(bytes, o + 12) > Int.MaxValue)
              return None
            width = u32be(bytes, o + 8).toInt
            height = u32be(bytes, o + 12).toInt
            // bit depth 8, truecolor (2), deflate (0), filter method 0,
            // no interlace — the supported profile
            if (bytes(o + 16) != 8 || bytes(o + 17) != 2 || bytes(o + 18) != 0 ||
              bytes(o + 19) != 0 || bytes(o + 20) != 0) return None
            seenIhdr = true
          case "IDAT" =>
            if (!seenIhdr) return None
            idat.write(bytes, o + 8, len.toInt)
          case "IEND" => ended = true
          case _ => () // ancillary chunks (tEXt, pHYs, ...): CRC-checked, skipped
        }
        o += 12 + len.toInt
      }
      if (!seenIhdr || width <= 0 || height <= 0) return None
      if (width.toLong * height > Int.MaxValue / 4) return None
      val stride = width * 3
      val rawLen = height.toLong * (stride + 1)
      if (rawLen > Int.MaxValue / 2) return None
      val raw = new Array[Byte](rawLen.toInt)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      try {
        var got = 0
        while (got < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, got, raw.length - got)
          if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None // truncated
          got += n
        }
        if (got < raw.length) return None
        if (!inf.finished()) {
          // drive the trailer: a complete stream finishes here (verifying
          // the zlib adler32); extra data or a truncated trailer rejects
          if (inf.inflate(new Array[Byte](1), 0, 1) != 0 || !inf.finished()) return None
        }
      } catch {
        case _: java.util.zip.DataFormatException => return None
      } finally inf.end()

      // reverse per-scanline filtering; prev/cur hold reconstructed bytes
      val px = new Array[Int](width * height)
      val prev = new Array[Int](stride)
      val cur = new Array[Int](stride)
      var y = 0
      while (y < height) {
        val rowOff = y * (stride + 1)
        val ft = raw(rowOff) & 0xFF
        if (ft > 4) return None
        var x = 0
        while (x < stride) {
          val rawB = raw(rowOff + 1 + x) & 0xFF
          val a = if (x >= 3) cur(x - 3) else 0 // left (bpp = 3 bytes)
          val b = prev(x) // up (zeros above the first row, per spec)
          val c = if (x >= 3) prev(x - 3) else 0 // upper-left
          cur(x) = (ft: @annotation.switch) match {
            case 0 => rawB
            case 1 => (rawB + a) & 0xFF
            case 2 => (rawB + b) & 0xFF
            case 3 => (rawB + ((a + b) >> 1)) & 0xFF
            case _ => (rawB + paeth(a, b, c)) & 0xFF
          }
          x += 1
        }
        var xx = 0
        val base = y * width
        while (xx < width) {
          px(base + xx) = (cur(xx * 3) << 16) | (cur(xx * 3 + 1) << 8) | cur(xx * 3 + 2)
          xx += 1
        }
        System.arraycopy(cur, 0, prev, 0, stride)
        y += 1
      }
      Some(DecodedImage(width, height, px))
    }

    /** Canonical encoder: scanline `y` uses filter type `y % 5`, so any
      * encode of an image ≥5 rows tall exercises ALL FIVE filters in the
      * decoder (and in every round-trip oracle); one zlib IDAT, default
      * compression. Deterministic for a given input. */
    def encode(img: DecodedImage): Array[Byte] = {
      val stride = img.width * 3
      val raw = new Array[Byte]((stride + 1) * img.height)
      val prev = new Array[Int](stride)
      val cur = new Array[Int](stride)
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val p = img(x, y)
          cur(x * 3) = (p >> 16) & 0xFF
          cur(x * 3 + 1) = (p >> 8) & 0xFF
          cur(x * 3 + 2) = p & 0xFF
          x += 1
        }
        val ft = y % 5
        val rowOff = y * (stride + 1)
        raw(rowOff) = ft.toByte
        var i = 0
        while (i < stride) {
          val a = if (i >= 3) cur(i - 3) else 0
          val b = prev(i)
          val c = if (i >= 3) prev(i - 3) else 0
          val v = (ft: @annotation.switch) match {
            case 0 => cur(i)
            case 1 => (cur(i) - a) & 0xFF
            case 2 => (cur(i) - b) & 0xFF
            case 3 => (cur(i) - ((a + b) >> 1)) & 0xFF
            case _ => (cur(i) - paeth(a, b, c)) & 0xFF
          }
          raw(rowOff + 1 + i) = v.toByte
          i += 1
        }
        System.arraycopy(cur, 0, prev, 0, stride)
        y += 1
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw)
      defl.finish()
      val zOut = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!defl.finished()) zOut.write(tmp, 0, defl.deflate(tmp))
      defl.end()

      val out = new java.io.ByteArrayOutputStream()
      def be32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      def chunk(ctype: String, data: Array[Byte]): Unit = {
        val tb = ctype.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        val crc = new java.util.zip.CRC32()
        crc.update(tb); crc.update(data)
        out.write(be32(data.length.toLong)); out.write(tb)
        out.write(data); out.write(be32(crc.getValue))
      }
      out.write(Sig)
      val ihdr = new java.io.ByteArrayOutputStream()
      ihdr.write(be32(img.width.toLong)); ihdr.write(be32(img.height.toLong))
      ihdr.write(8); ihdr.write(2); ihdr.write(0); ihdr.write(0); ihdr.write(0)
      chunk("IHDR", ihdr.toByteArray)
      chunk("IDAT", zOut.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }
  }

  /** Content-sniffing image codec: dispatch on magic bytes (BMP `BM`, PNG
    * signature) — the entry point a real mixed-format media column needs;
    * new formats join by adding one magic branch. */
  object SniffImageCodec extends ImageCodec {
    val name = "sniff"
    def decode(bytes: Array[Byte]): Option[DecodedImage] = {
      if (bytes == null || bytes.length < 8) None
      else if (bytes(0) == 'B' && bytes(1) == 'M') BmpCodec.decode(bytes)
      else if ((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P') PngCodec.decode(bytes)
      else None
    }
  }

  /** Deterministic synthetic raster: pixel (x, y) of frame `frame` of media
    * `id` has channels r/g/b = (x·7 + y·13 + id·31 + frame·19 + c·97) mod 256
    * for c = 0/1/2 — pure integer arithmetic any engine reproduces exactly
    * (the q_bmp_features / q_avi_frames oracles recompute it in SQL). */
  def syntheticImage(id: Long, width: Int, height: Int, frame: Int = 0): DecodedImage = {
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val base = x.toLong * 7 + y.toLong * 13 + id * 31 + frame.toLong * 19
        val r = (((base % 256) + 256) % 256).toInt
        val g = ((((base + 97) % 256) + 256) % 256).toInt
        val b = ((((base + 194) % 256) + 256) % 256).toInt
        px(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    DecodedImage(width, height, px)
  }

  /** Nearest-neighbor resample — the one resize kernel whose output a SQL
    * oracle can re-derive exactly: target pixel (x, y) is source pixel
    * (⌊x·sw/tw⌋, ⌊y·sh/th⌋), all integer floor division. */
  def resizeNearest(img: DecodedImage, targetW: Int, targetH: Int): DecodedImage = {
    require(targetW > 0 && targetH > 0, s"bad target ${targetW}x$targetH")
    val px = new Array[Int](targetW * targetH)
    var y = 0
    while (y < targetH) {
      val sy = (y.toLong * img.height / targetH).toInt
      var x = 0
      while (x < targetW) {
        val sx = (x.toLong * img.width / targetW).toInt
        px(y * targetW + x) = img(sx, sy)
        x += 1
      }
      y += 1
    }
    DecodedImage(targetW, targetH, px)
  }

  /** Integer image features — exact arithmetic over decoded pixels so a SQL
    * oracle re-derives them bit-for-bit. `checksum` weights each pixel by
    * its 1-based raster position, so a row-order bug (bottom-up read as
    * top-down) breaks the match even though plain channel sums would
    * cancel out. Failed decodes carry −1 sentinels. */
  final case class ImageFeature(
      media_id: Long, decode_ok: Boolean, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, checksum: Long)

  private def imageFeature(id: Long, d: DecodedImage): ImageFeature = {
    var sr = 0L; var sg = 0L; var sb = 0L; var cs = 0L
    var i = 0
    while (i < d.pixels.length) {
      val p = d.pixels(i)
      val r = (p >> 16) & 0xFF; val g = (p >> 8) & 0xFF; val b = p & 0xFF
      sr += r; sg += g; sb += b
      cs += (i + 1).toLong * (r + g + b)
      i += 1
    }
    ImageFeature(id, decode_ok = true, d.width, d.height, sr, sg, sb, cs)
  }

  /** Distributed image feature extraction over a binary column: pure
    * per-row decode + reduce, no shuffle, constant memory per row. */
  def extractImageFeatures(media: DataFrame, idCol: String, bytesCol: String,
      codec: ImageCodec = BmpCodec): Dataset[ImageFeature] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        codec.decode(bytes) match {
          case Some(d) => imageFeature(id, d)
          case None => ImageFeature(id, decode_ok = false, -1, -1, -1L, -1L, -1L, -1L)
        }
      }
  }

  // ------------------------------------------------------------ video codec

  /** Decoded video — frames are canonical top-down rasters sharing one
    * geometry; `microSecPerFrame` carries the container's frame clock. */
  final case class DecodedVideo(
      width: Int, height: Int, microSecPerFrame: Long, frames: Vector[DecodedImage]) {
    def frameTsMs(idx: Int): Long = idx.toLong * microSecPerFrame / 1000L
  }

  trait VideoCodec extends Serializable {
    def name: String
    def decode(bytes: Array[Byte]): Option[DecodedVideo]
  }

  /** Pure-JVM AVI codec for uncompressed 24-bit 'DIB ' video — RIFF 'AVI '
    * with the standard LIST hdrl (avih + strl{strh,strf}) and LIST movi
    * carrying one '00db' chunk per frame of raw bottom-up DIB raster. The
    * same chunk-walk discipline as [[WavCodec]] (unknown chunks skipped,
    * word alignment honored); anything not single-stream uncompressed
    * 24-bit video returns None. Real-world compressed AVI/MP4 swaps in at
    * this seam exactly as ffmpeg would for WavCodec. */
  object AviCodec extends VideoCodec {
    val name = "avi"

    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    private def u32(b: Array[Byte], o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)

    def decode(bytes: Array[Byte]): Option[DecodedVideo] = {
      if (bytes == null || bytes.length < 24) return None
      if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ") return None
      var microSecPerFrame = -1L
      var width = -1; var height = -1
      var fmtOk = false // strf says 24-bit BI_RGB
      val frameOffsets = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]

      // walk one LIST/RIFF body [from, to); LISTs recurse
      def walk(from: Int, to: Int): Boolean = {
        var o = from
        while (o + 8 <= to) {
          val id = tag(bytes, o)
          val size = u32(bytes, o + 4)
          val body = o + 8
          if (size < 0 || body + size > to) return false
          id match {
            case "LIST" =>
              if (size < 4) return false
              val listType = tag(bytes, body)
              if (listType == "movi") {
                // frame chunks live in movi, possibly grouped in LIST 'rec '
                def scanMovi(from: Int, to: Int): Boolean = {
                  var m = from
                  while (m + 8 <= to) {
                    val cid = tag(bytes, m)
                    val csize = u32(bytes, m + 4)
                    if (csize < 0 || m + 8 + csize > to) return false
                    if (cid == "00db" || cid == "00dc")
                      frameOffsets += ((m + 8, csize.toInt))
                    else if (cid == "LIST" && csize >= 4 &&
                      tag(bytes, m + 8) == "rec ") {
                      if (!scanMovi(m + 12, m + 8 + csize.toInt)) return false
                    }
                    m += 8 + csize.toInt + (csize.toInt & 1)
                  }
                  true
                }
                if (!scanMovi(body + 4, body + size.toInt)) return false
              } else if (!walk(body + 4, body + size.toInt)) return false
            case "avih" =>
              if (size < 56) return false
              microSecPerFrame = u32(bytes, body)
              width = u32(bytes, body + 32).toInt
              height = u32(bytes, body + 36).toInt
            case "strf" =>
              // BITMAPINFOHEADER of the video stream: demand 24-bit BI_RGB
              if (size >= 40 && u32(bytes, body) == 40L &&
                u16le(bytes, body + 12) == 1 && // biPlanes
                u16le(bytes, body + 14) == 24 && // biBitCount
                u32(bytes, body + 16) == 0L) fmtOk = true
            case _ => () // strh, idx1, JUNK, ...: skip
          }
          o = body + size.toInt + (size.toInt & 1)
        }
        true
      }

      if (!walk(12, bytes.length)) return None
      if (microSecPerFrame <= 0 || width <= 0 || height == 0 || !fmtOk) return None
      val frames = frameOffsets.toVector.map { case (off, len) =>
        val stride = ((width * 3 + 3) / 4) * 4
        if (len < stride * math.abs(height)) return None
        decodeDib24(bytes, off, width, height) match {
          case Some(img) => img
          case None => return None
        }
      }
      if (frames.isEmpty) None
      else Some(DecodedVideo(width, math.abs(height), microSecPerFrame, frames))
    }

    /** Canonical-form encoder: hdrl(avih + strl{strh,strf}) + movi of
      * '00db' DIB frames. All frames must share one geometry. */
    def encode(frames: Seq[DecodedImage], microSecPerFrame: Long): Array[Byte] = {
      require(frames.nonEmpty, "no frames")
      require(microSecPerFrame > 0, s"bad frame clock $microSecPerFrame")
      val w = frames.head.width; val h = frames.head.height
      require(frames.forall(f => f.width == w && f.height == h),
        "frames must share one geometry")
      val dibs = frames.map(encodeDib24)
      val frameBytes = dibs.head.length

      val bb = new java.io.ByteArrayOutputStream()
      def putTag(s: String): Unit = bb.write(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      def put16(v: Int): Unit = { bb.write(v & 0xFF); bb.write((v >> 8) & 0xFF) }
      def put32(v: Long): Unit = {
        var i = 0
        while (i < 4) { bb.write(((v >> (8 * i)) & 0xFF).toInt); i += 1 }
      }

      // sizes from the inside out
      val strfSize = 40
      val strhSize = 56
      val avihSize = 56
      val strlSize = 4 + 8 + strhSize + 8 + strfSize
      val hdrlSize = 4 + 8 + avihSize + 8 + strlSize
      val moviSize = 4 + dibs.map(d => 8 + d.length + (d.length & 1)).sum
      val riffSize = 4 + 8 + hdrlSize + 8 + moviSize

      putTag("RIFF"); put32(riffSize.toLong); putTag("AVI ")
      putTag("LIST"); put32(hdrlSize.toLong); putTag("hdrl")
      putTag("avih"); put32(avihSize.toLong)
      put32(microSecPerFrame) // dwMicroSecPerFrame
      put32(0L); put32(0L); put32(0L) // maxBytesPerSec, padding, flags
      put32(frames.length.toLong) // dwTotalFrames
      put32(0L); put32(1L) // initialFrames, streams
      put32(frameBytes.toLong) // suggestedBufferSize
      put32(w.toLong); put32(h.toLong)
      put32(0L); put32(0L); put32(0L); put32(0L) // reserved
      putTag("LIST"); put32(strlSize.toLong); putTag("strl")
      putTag("strh"); put32(strhSize.toLong)
      putTag("vids"); putTag("DIB ")
      put32(0L); put16(0); put16(0); put32(0L) // flags, priority, language, initialFrames
      put32(microSecPerFrame); put32(1000000L) // dwScale/dwRate: rate/scale = fps
      put32(0L); put32(frames.length.toLong) // start, length
      put32(frameBytes.toLong); put32(0L); put32(0L) // bufferSize, quality, sampleSize
      put16(0); put16(0); put16(w); put16(h) // rcFrame
      putTag("strf"); put32(strfSize.toLong)
      put32(40L); put32(w.toLong); put32(h.toLong) // biSize, w, h (bottom-up)
      put16(1); put16(24); put32(0L) // planes, bpp, BI_RGB
      put32(frameBytes.toLong); put32(0L); put32(0L); put32(0L); put32(0L)
      putTag("LIST"); put32(moviSize.toLong); putTag("movi")
      dibs.foreach { d =>
        putTag("00db"); put32(d.length.toLong); bb.write(d)
        if ((d.length & 1) == 1) bb.write(0) // word alignment
      }
      bb.toByteArray
    }
  }

  /** Deterministic synthetic AVI: `nFrames` frames of [[syntheticImage]]
    * (frame index feeds the pixel formula) at the given frame clock. */
  def syntheticAvi(id: Long, width: Int, height: Int, nFrames: Int,
      microSecPerFrame: Long = 40000L): Array[Byte] =
    AviCodec.encode(
      (0 until nFrames).map(f => syntheticImage(id, width, height, f)),
      microSecPerFrame)

  /** One sampled, decoded video frame with its integer features — the
    * video analogue of [[ImageFeature]], oracle-derivable end to end. */
  final case class VideoFrameFeature(
      media_id: Long, frame_idx: Int, frame_ts_ms: Long,
      width: Int, height: Int, sum_r: Long, sum_g: Long, sum_b: Long, checksum: Long)

  /** REAL frame sampling over a binary video column: decode the container,
    * take every ⌈everyMs / frameMs⌉-th frame (never fewer than one in
    * `everyMs`, capped at `maxFrames`), and reduce each decoded frame to
    * exact integer features. Pure per-row work — no shuffle; the container
    * bytes never leave the task. Undecodable rows emit nothing (corrupt
    * media is data, not a job error — count them upstream via
    * [[extractImageFeatures]]-style decode_ok flags if needed). */
  def sampleVideoFrames(media: DataFrame, idCol: String, bytesCol: String,
      everyMs: Long = 1000L, maxFrames: Int = 32,
      codec: VideoCodec = AviCodec): Dataset[VideoFrameFeature] = {
    require(everyMs > 0 && maxFrames > 0, s"bad sampling: every $everyMs ms, max $maxFrames")
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        codec.decode(bytes) match {
          case Some(v) =>
            val frameMs = math.max(v.microSecPerFrame / 1000L, 1L)
            val step = math.max((everyMs + frameMs - 1) / frameMs, 1L).toInt
            Iterator.range(0, v.frames.length, step).take(maxFrames).map { i =>
              val f = imageFeature(id, v.frames(i))
              VideoFrameFeature(id, i, v.frameTsMs(i), f.width, f.height,
                f.sum_r, f.sum_g, f.sum_b, f.checksum)
            }
          case None => Iterator.empty
        }
      }
  }

  /** One unified feature row across ALL media kinds — every field exact
    * integer arithmetic a SQL oracle re-derives: `units` is pixels for an
    * image, PCM frames for audio, container frames for video; `checksum`
    * is the kind's exact content digest (position-weighted pixel sum /
    * sample sum / per-frame pixel-sum total). Inapplicable dims carry −1. */
  final case class UnifiedMediaFeature(
      media_id: Long, kind: String, decode_ok: Boolean,
      width: Int, height: Int, duration_ms: Long, units: Long, checksum: Long)

  /** The real-decode counterpart of the [[extractFeatures]] stub pipeline:
    * one pass over a mixed-modality corpus, dispatching each row's bytes to
    * the REAL codec for its `kind` column (image bytes additionally
    * format-sniffed, so BMP and PNG coexist in one column). Pure per-row
    * work — bytes never leave the task, no shuffle; rows whose bytes fail
    * their codec come back `decode_ok = false` with sentinel features
    * (corrupt media is data, not a job error). */
  def extractMediaFeatures(media: DataFrame, idCol: String, kindCol: String,
      bytesCol: String,
      imageCodec: ImageCodec = SniffImageCodec,
      audioCodec: AudioCodec = WavCodec,
      videoCodec: VideoCodec = AviCodec): Dataset[UnifiedMediaFeature] = {
    import media.sparkSession.implicits._
    media.select(col(idCol).cast("long"), col(kindCol), col(bytesCol))
      .as[(Long, String, Array[Byte])]
      .map { case (id, kind, bytes) =>
        def failed = UnifiedMediaFeature(id, kind, decode_ok = false, -1, -1, -1L, -1L, -1L)
        kind match {
          case "image" => imageCodec.decode(bytes) match {
            case Some(img) =>
              val f = imageFeature(id, img)
              UnifiedMediaFeature(id, kind, decode_ok = true, img.width, img.height,
                -1L, img.width.toLong * img.height, f.checksum)
            case None => failed
          }
          case "audio" => audioCodec.decode(bytes) match {
            case Some(a) =>
              var sum = 0L; var i = 0
              while (i < a.samples.length) { sum += a.samples(i); i += 1 }
              UnifiedMediaFeature(id, kind, decode_ok = true, -1, -1,
                a.durationMs, a.nFrames, sum)
            case None => failed
          }
          case "video" => videoCodec.decode(bytes) match {
            case Some(v) =>
              var sum = 0L
              v.frames.foreach(fr => sum += imageFeature(id, fr).checksum)
              UnifiedMediaFeature(id, kind, decode_ok = true, v.width, v.height,
                v.frameTsMs(v.frames.length), v.frames.length.toLong, sum)
            case None => failed
          }
          case _ => failed
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
