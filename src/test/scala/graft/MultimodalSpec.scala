package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("synthetic media is deterministic across partitioning") {
    val a = Multimodal.syntheticMedia(spark, 50L).collect().sortBy(_.media_id)
    val b = Multimodal.syntheticMedia(spark, 50L).repartition(7).collect().sortBy(_.media_id)
    a.zip(b).foreach { case (x, y) =>
      x.kind shouldBe y.kind
      x.bytes.toSeq shouldBe y.bytes.toSeq
    }
  }

  test("feature extraction: per-partition batch pass, fixed dim, deterministic") {
    val media = Multimodal.syntheticMedia(spark, 60L)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media.repartition(5)).collect().sortBy(_.media_id)
    f1.length shouldBe 60
    all(f1.map(_.feature.length)) shouldBe 16
    all(f1.map(_.decode_ok)) shouldBe true
    f1.zip(f2).foreach { case (x, y) => x.feature.toSeq shouldBe y.feature.toSeq }
  }

  test("frame sampling respects duration and cap") {
    val media = Multimodal.syntheticMedia(spark, 30L)
    val frames = Multimodal.sampleFrames(media, everyMs = 5000L, maxFrames = 8)
    val byId = frames.collect().groupBy(_.media_id)
    byId.values.foreach { fs =>
      fs.length should be <= 8
      fs.map(_.frame_idx).sorted shouldBe (0 until fs.length)
    }
    // only videos produce frames
    val kinds = media.filter(m => byId.contains(m.media_id)).collect().map(_.kind).toSet
    kinds shouldBe Set("video")
  }

  test("WavCodec golden bytes: absolute RIFF layout, round-trip, chunk walk, corrupt inputs") {
    import Multimodal.{DecodedAudio, WavCodec}
    // hand-pinned absolute layout (byte-for-byte, straight from the RIFF
    // spec — this is what catches an endianness bug that a pure
    // encode→decode round-trip would cancel out): mono 8000 Hz, samples
    // [1, -2] → data s16le bytes 01 00 FE FF
    val enc = WavCodec.encode(Array(1, -2), 8000, 1)
    val expected: Array[Int] = Array(
      'R', 'I', 'F', 'F', 40, 0, 0, 0, 'W', 'A', 'V', 'E', // 36 + 4 data bytes
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, // PCM
      1, 0, // mono
      0x40, 0x1F, 0, 0, // 8000 Hz
      0x80, 0x3E, 0, 0, // byte rate 16000
      2, 0, // block align
      16, 0, // bits
      'd', 'a', 't', 'a', 4, 0, 0, 0,
      0x01, 0x00, 0xFE, 0xFF)
    enc.map(_ & 0xFF).toSeq shouldBe expected.toSeq
    val golden = WavCodec.decode(enc).get
    (golden.sampleRate, golden.channels, golden.bitsPerSample) shouldBe ((8000, 1, 16))
    golden.samples.toSeq shouldBe Seq(1, -2)

    // full s16 dynamic range round-trips exactly (incl. both extremes)
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345)
    val d = WavCodec.decode(WavCodec.encode(samples, 44100, 1)).get
    d.samples.toSeq shouldBe samples.toSeq
    d.sampleRate shouldBe 44100

    // stereo: interleaved samples, frames = samples / channels
    val st = WavCodec.decode(WavCodec.encode(Array(1, 2, 3, 4), 8000, 2)).get
    st.channels shouldBe 2
    st.nFrames shouldBe 2L
    st.durationMs shouldBe 0L // 2 frames at 8 kHz
    DecodedAudio(8000, 1, 16, new Array[Int](8000)).durationMs shouldBe 1000L

    // chunk walk: a LIST chunk (odd-sized → word-padded) between fmt and
    // data must be skipped, like real-world WAV metadata
    val base = WavCodec.encode(Array(7, -7), 8000, 1)
    val listBody = Array[Byte]('I', 'N', 'F') // 3 bytes: exercises padding
    val withList = new java.io.ByteArrayOutputStream()
    withList.write(base, 0, 36) // through fmt
    withList.write(Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0))
    withList.write(listBody); withList.write(0) // pad to even
    withList.write(base, 36, base.length - 36) // data chunk
    val padded = withList.toByteArray
    // fix the RIFF size field for the inserted 12 bytes
    val riffSize = padded.length - 8
    (0 until 4).foreach(i => padded(4 + i) = ((riffSize >> (8 * i)) & 0xFF).toByte)
    WavCodec.decode(padded).map(_.samples.toSeq) shouldBe Some(Seq(7, -7))

    // corrupt inputs: None, never a throw
    WavCodec.decode(null) shouldBe None
    WavCodec.decode(Array.empty[Byte]) shouldBe None
    WavCodec.decode("RIFFxxxxWAVEnot a real file at all, padding padding".getBytes) shouldBe None
    val truncated = enc.take(enc.length - 1) // data chunk overruns buffer
    WavCodec.decode(truncated) shouldBe None
    val badFormat = enc.clone(); badFormat(20) = 3 // IEEE-float format tag
    WavCodec.decode(badFormat) shouldBe None
  }

  test("extractAudioFeatures: distributed decode, exact integer features, corrupt rows flagged") {
    import spark.implicits._
    import Multimodal.WavCodec
    val media = spark.range(40).map { id =>
      val n = (50 + id % 30).toInt
      val bytes =
        if (id % 10 == 9) Array[Byte](1, 2, 3) // corrupt row
        else WavCodec.encode(Multimodal.syntheticWavSamples(id, n), 8000, 1)
      (id, bytes)
    }.toDF("media_id", "bytes")
    val feats = Multimodal.extractAudioFeatures(media.repartition(7), "media_id", "bytes")
      .collect().sortBy(_.media_id)
    feats.length shouldBe 40
    feats.filter(_.media_id % 10 == 9).foreach { f =>
      f.decode_ok shouldBe false
      f.n_frames shouldBe -1L
    }
    feats.filter(_.media_id % 10 != 9).foreach { f =>
      f.decode_ok shouldBe true
      val samples = Multimodal.syntheticWavSamples(f.media_id, (50 + f.media_id % 30).toInt)
      f.n_frames shouldBe samples.length.toLong
      f.checksum shouldBe samples.map(_.toLong).sum
      f.sum_squares shouldBe samples.map(s => s.toLong * s).sum
      f.peak_abs shouldBe samples.map(s => math.abs(s.toLong)).max
      f.duration_ms shouldBe samples.length.toLong * 1000L / 8000L
    }
  }

  // little-endian 32-bit patch, shared by the container-surgery tests below
  private def put32(b: Array[Byte], o: Int, v: Int): Unit =
    (0 until 4).foreach(i => b(o + i) = ((v >> (8 * i)) & 0xFF).toByte)

  test("BmpCodec golden bytes: absolute header + bottom-up padded raster") {
    import Multimodal.{BmpCodec, DecodedImage}
    // 2x2, pixels top-down: (0,0)=112233 (1,0)=445566 (0,1)=778899 (1,1)=AABBCC
    val img = DecodedImage(2, 2, Array(0x112233, 0x445566, 0x778899, 0xAABBCC))
    val enc = BmpCodec.encode(img)
    // hand-pinned from the BMP spec: 14-byte file header + 40-byte
    // BITMAPINFOHEADER, then the raster BOTTOM-UP in B,G,R order with each
    // row padded to 4 bytes — this catches the row-flip and channel-order
    // bugs a pure round-trip would cancel out
    val expected: Array[Int] = Array(
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header (size 54+16)
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, // dib, w=2, h=2 (bottom-up)
      1, 0, 24, 0, 0, 0, 0, 0, 16, 0, 0, 0, // planes, bpp, BI_RGB, sizeImage
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, // ppm + palette fields
      0x99, 0x88, 0x77, 0xCC, 0xBB, 0xAA, 0, 0, // raster row y=1 first + pad
      0x33, 0x22, 0x11, 0x66, 0x55, 0x44, 0, 0) // raster row y=0 + pad
    enc.map(_ & 0xFF).toSeq shouldBe expected.toSeq
    BmpCodec.decode(enc).get.pixels.toSeq shouldBe img.pixels.toSeq

    // top-down variant (negative biHeight) decodes to the same canonical
    // orientation: same header with h=-2, raster rows in image order
    val td = enc.clone()
    put32(td, 22, -2)
    System.arraycopy(enc, 62, td, 54, 8) // image row 0 first
    System.arraycopy(enc, 54, td, 62, 8)
    val tdImg = BmpCodec.decode(td).get
    (tdImg.width, tdImg.height) shouldBe ((2, 2))
    tdImg.pixels.toSeq shouldBe img.pixels.toSeq
  }

  test("BmpCodec round-trips every width mod 4 and rejects corrupt bytes") {
    import Multimodal.{BmpCodec, DecodedImage}
    val rng = new scala.util.Random(7)
    for (w <- 1 to 6; h <- 1 to 4) {
      val img = DecodedImage(w, h, Array.fill(w * h)(rng.nextInt(0x1000000)))
      val back = BmpCodec.decode(BmpCodec.encode(img)).get
      (back.width, back.height) shouldBe ((w, h))
      back.pixels.toSeq shouldBe img.pixels.toSeq
    }
    BmpCodec.decode(null) shouldBe None
    BmpCodec.decode(Array.empty[Byte]) shouldBe None
    BmpCodec.decode("not a bitmap at all, but long enough to pass the length gate....".getBytes) shouldBe None
    val good = BmpCodec.encode(Multimodal.syntheticImage(5L, 4, 3))
    BmpCodec.decode(good.take(good.length - 1)) shouldBe None // raster overruns
    val bpp32 = good.clone(); bpp32(28) = 32 // not 24-bit
    BmpCodec.decode(bpp32) shouldBe None
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    BmpCodec.decode(rle) shouldBe None
    val hostile = good.clone(); put32(hostile, 18, Int.MaxValue / 2) // width bomb
    BmpCodec.decode(hostile) shouldBe None
  }

  test("resizeNearest: exact floor-division mapping, identity at same size") {
    import Multimodal.{resizeNearest, syntheticImage}
    val img = syntheticImage(11L, 7, 5)
    val same = resizeNearest(img, 7, 5)
    same.pixels.toSeq shouldBe img.pixels.toSeq
    for ((tw, th) <- Seq((3, 2), (14, 10), (1, 1), (5, 7))) {
      val r = resizeNearest(img, tw, th)
      (r.width, r.height) shouldBe ((tw, th))
      for (y <- 0 until th; x <- 0 until tw)
        r(x, y) shouldBe img((x.toLong * 7 / tw).toInt, (y.toLong * 5 / th).toInt)
    }
  }

  test("extractImageFeatures: distributed decode, position-weighted checksum, corrupt rows flagged") {
    import spark.implicits._
    import Multimodal.BmpCodec
    val media = spark.range(40).map { id =>
      val bytes =
        if (id % 10 == 7) Array[Byte](9, 9, 9)
        else BmpCodec.encode(Multimodal.syntheticImage(id, (2 + id % 5).toInt, (1 + id % 4).toInt))
      (id, bytes)
    }.toDF("media_id", "bytes")
    val feats = Multimodal.extractImageFeatures(media.repartition(7), "media_id", "bytes")
      .collect().sortBy(_.media_id)
    feats.length shouldBe 40
    feats.filter(_.media_id % 10 == 7).foreach { f =>
      f.decode_ok shouldBe false; f.width shouldBe -1
    }
    feats.filter(_.media_id % 10 != 7).foreach { f =>
      val img = Multimodal.syntheticImage(f.media_id, (2 + f.media_id % 5).toInt, (1 + f.media_id % 4).toInt)
      (f.width, f.height) shouldBe ((img.width, img.height))
      val chans = img.pixels.map(p => ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF))
      f.sum_r shouldBe chans.map(_._1.toLong).sum
      f.sum_g shouldBe chans.map(_._2.toLong).sum
      f.sum_b shouldBe chans.map(_._3.toLong).sum
      f.checksum shouldBe chans.zipWithIndex.map { case ((r, g, b), i) =>
        (i + 1).toLong * (r + g + b) }.sum
    }
  }

  // Re-encode one chunk's CRC after a test patches its bytes — lets the
  // profile-rejection tests below fail on the PROFILE check, not the CRC.
  private def fixPngCrc(b: Array[Byte], chunkOff: Int): Unit = {
    val len = ((b(chunkOff) & 0xFF) << 24) | ((b(chunkOff + 1) & 0xFF) << 16) |
      ((b(chunkOff + 2) & 0xFF) << 8) | (b(chunkOff + 3) & 0xFF)
    val crc = new java.util.zip.CRC32()
    crc.update(b, chunkOff + 4, 4 + len)
    val v = crc.getValue
    (0 until 4).foreach(i => b(chunkOff + 8 + len + i) = ((v >> (8 * (3 - i))) & 0xFF).toByte)
  }

  test("PngCodec: round-trip sweep over all five filters, cross-codec pixel agreement") {
    import Multimodal.{BmpCodec, DecodedImage, PngCodec, syntheticImage}
    val rng = new scala.util.Random(13)
    // heights 1-7 cover files that use a prefix of the y%5 filter schedule
    // AND files that contain all five filter types; random pixels make the
    // Average/Paeth reconstructions carry real information
    for (w <- 1 to 6; h <- 1 to 7) {
      val img = DecodedImage(w, h, Array.fill(w * h)(rng.nextInt(0x1000000)))
      val back = PngCodec.decode(PngCodec.encode(img)).get
      (back.width, back.height) shouldBe ((w, h))
      back.pixels.toSeq shouldBe img.pixels.toSeq
    }
    // the two image codecs agree pixel-for-pixel through their containers
    val img = syntheticImage(9L, 7, 6)
    PngCodec.decode(PngCodec.encode(img)).get.pixels.toSeq shouldBe
      BmpCodec.decode(BmpCodec.encode(img)).get.pixels.toSeq
  }

  test("PngCodec vs javax.imageio: independent implementations agree both directions") {
    import Multimodal.{DecodedImage, PngCodec, syntheticImage}
    // ImageIO is the JDK's own PNG codec — a round-trip against it catches
    // encoder/decoder COMPENSATING bugs (e.g. a shared wrong Paeth
    // tie-break) that our own round-trip would cancel out
    val img = syntheticImage(21L, 9, 8) // ≥5 rows: all five filters in our encode
    val ours = PngCodec.encode(img)
    val viaIio = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    viaIio.getWidth shouldBe 9
    viaIio.getHeight shouldBe 8
    for (y <- 0 until 8; x <- 0 until 9)
      (viaIio.getRGB(x, y) & 0xFFFFFF) shouldBe img(x, y)

    // and the reverse: a FOREIGN truecolor PNG (ImageIO's writer, its own
    // filter choices and zlib stream) decodes through our chunk walk
    val bi = new java.awt.image.BufferedImage(6, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val src = DecodedImage(6, 7, Array.tabulate(42)(i => (i * 9973) & 0xFFFFFF))
    for (y <- 0 until 7; x <- 0 until 6) bi.setRGB(x, y, src(x, y))
    val bo = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", bo) shouldBe true
    val back = PngCodec.decode(bo.toByteArray).get
    (back.width, back.height) shouldBe ((6, 7))
    back.pixels.toSeq shouldBe src.pixels.toSeq
  }

  test("PngCodec rejects corrupt bytes, bad CRCs, and out-of-profile files") {
    import Multimodal.{PngCodec, syntheticImage}
    val good = PngCodec.encode(syntheticImage(4L, 5, 6))
    PngCodec.decode(null) shouldBe None
    PngCodec.decode(Array.empty[Byte]) shouldBe None
    PngCodec.decode("definitely not a portable network graphics file here".getBytes) shouldBe None
    PngCodec.decode(good.take(good.length - 1)) shouldBe None // IEND truncated
    // flip one IDAT payload byte: the chunk CRC must catch it
    val flipped = good.clone(); flipped(8 + 25 + 8 + 2) = (flipped(8 + 25 + 8 + 2) ^ 0x5A).toByte
    PngCodec.decode(flipped) shouldBe None
    // out-of-profile IHDRs, each with a RECOMPUTED CRC so the profile
    // check itself (not the CRC) does the rejecting
    def withIhdr(patch: Array[Byte] => Unit): Option[_] = {
      val b = good.clone(); patch(b); fixPngCrc(b, 8); PngCodec.decode(b)
    }
    withIhdr(b => b(8 + 8 + 9) = 6) shouldBe None // color type RGBA
    withIhdr(b => b(8 + 8 + 8) = 16) shouldBe None // 16-bit depth
    withIhdr(b => b(8 + 8 + 12) = 1) shouldBe None // Adam7 interlace
    // truncated zlib stream behind valid chunk framing: shorten the IDAT
    // payload and reframe (len, data, fixed CRC) — inflate must report it
    val idatLen = ((good(8 + 25) & 0xFF) << 24) | ((good(8 + 26) & 0xFF) << 16) |
      ((good(8 + 27) & 0xFF) << 8) | (good(8 + 28) & 0xFF)
    val cut = 3
    val short = new Array[Byte](good.length - cut)
    System.arraycopy(good, 0, short, 0, 8 + 25 + 8 + idatLen - cut) // through shortened payload
    System.arraycopy(good, 8 + 25 + 8 + idatLen, short, 8 + 25 + 8 + idatLen - cut, good.length - (8 + 25 + 8 + idatLen)) // CRC + IEND
    val nl = idatLen - cut
    short(8 + 25) = ((nl >> 24) & 0xFF).toByte; short(8 + 26) = ((nl >> 16) & 0xFF).toByte
    short(8 + 27) = ((nl >> 8) & 0xFF).toByte; short(8 + 28) = (nl & 0xFF).toByte
    fixPngCrc(short, 8 + 25)
    PngCodec.decode(short) shouldBe None
  }

  test("SniffImageCodec dispatches a mixed BMP/PNG corpus by magic bytes") {
    import spark.implicits._
    import Multimodal.{BmpCodec, PngCodec, SniffImageCodec}
    val media = spark.range(30).map { id =>
      val img = Multimodal.syntheticImage(id, (3 + id % 5).toInt, (2 + id % 6).toInt)
      val bytes = (id % 3) match {
        case 0 => BmpCodec.encode(img)
        case 1 => PngCodec.encode(img)
        case _ => Array[Byte](0, 1, 2, 3, 4, 5, 6, 7, 8) // neither magic
      }
      (id, bytes)
    }.toDF("media_id", "bytes")
    val feats = Multimodal.extractImageFeatures(media.repartition(4), "media_id", "bytes",
      SniffImageCodec).collect().sortBy(_.media_id)
    feats.length shouldBe 30
    feats.foreach { f =>
      if (f.media_id % 3 == 2) f.decode_ok shouldBe false
      else {
        f.decode_ok shouldBe true
        val img = Multimodal.syntheticImage(f.media_id, (3 + f.media_id % 5).toInt, (2 + f.media_id % 6).toInt)
        (f.width, f.height) shouldBe ((img.width, img.height))
        val chans = img.pixels.map(p => ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF))
        f.checksum shouldBe chans.zipWithIndex.map { case (s, i) => (i + 1).toLong * s }.sum
      }
    }
  }

  test("AviCodec: round-trip, frame clock, chunk skipping, rec groups, corrupt inputs") {
    import Multimodal.{AviCodec, syntheticImage}
    val frames = (0 until 4).map(f => syntheticImage(3L, 5, 3, f))
    val enc = AviCodec.encode(frames, 40000L)
    val dec = AviCodec.decode(enc).get
    (dec.width, dec.height, dec.microSecPerFrame) shouldBe ((5, 3, 40000L))
    dec.frames.length shouldBe 4
    dec.frames.zip(frames).foreach { case (a, b) => a.pixels.toSeq shouldBe b.pixels.toSeq }
    dec.frameTsMs(3) shouldBe 120L

    // a JUNK chunk between hdrl and movi (real muxers pad this way) must
    // be skipped; RIFF size patched for the inserted 12 bytes
    val junkAt = 12 + 8 + 192 // after LIST hdrl (fixed layout of our encoder)
    val junked = new Array[Byte](enc.length + 12)
    System.arraycopy(enc, 0, junked, 0, junkAt)
    junked(junkAt) = 'J'; junked(junkAt + 1) = 'U'; junked(junkAt + 2) = 'N'; junked(junkAt + 3) = 'K'
    put32(junked, junkAt + 4, 4)
    System.arraycopy(enc, junkAt, junked, junkAt + 12, enc.length - junkAt)
    put32(junked, 4, junked.length - 8)
    AviCodec.decode(junked).get.frames.length shouldBe 4

    // frames wrapped in a LIST 'rec ' group (interleaved-AVI convention):
    // movi body becomes one rec LIST holding all four 00db chunks
    val moviHdr = 12 + 8 + 192 // LIST size dword at +4, 'movi' tag at +8
    val moviSize = {
      val b = enc; (b(moviHdr + 4) & 0xFF) | ((b(moviHdr + 5) & 0xFF) << 8) |
        ((b(moviHdr + 6) & 0xFF) << 16) | ((b(moviHdr + 7) & 0xFF) << 24)
    }
    val chunksLen = moviSize - 4
    val rec = new Array[Byte](enc.length + 12)
    System.arraycopy(enc, 0, rec, 0, moviHdr + 12) // through 'movi' tag
    put32(rec, moviHdr + 4, moviSize + 12) // movi grew by the rec wrapper
    rec(moviHdr + 12) = 'L'; rec(moviHdr + 13) = 'I'; rec(moviHdr + 14) = 'S'; rec(moviHdr + 15) = 'T'
    put32(rec, moviHdr + 16, 4 + chunksLen)
    rec(moviHdr + 20) = 'r'; rec(moviHdr + 21) = 'e'; rec(moviHdr + 22) = 'c'; rec(moviHdr + 23) = ' '
    System.arraycopy(enc, moviHdr + 12, rec, moviHdr + 24, chunksLen)
    put32(rec, 4, rec.length - 8)
    val recDec = AviCodec.decode(rec).get
    recDec.frames.length shouldBe 4
    recDec.frames.zip(frames).foreach { case (a, b) => a.pixels.toSeq shouldBe b.pixels.toSeq }

    // corrupt inputs: None, never a throw
    AviCodec.decode(null) shouldBe None
    AviCodec.decode(Array.empty[Byte]) shouldBe None
    AviCodec.decode("RIFFxxxxAVI but nothing else that a parser could use here".getBytes) shouldBe None
    AviCodec.decode(enc.take(enc.length - 5)) shouldBe None // last frame truncated
    val badClock = enc.clone(); put32(badClock, 12 + 8 + 4 + 8, 0) // µs/frame = 0
    AviCodec.decode(badClock) shouldBe None
    val compressed = enc.clone()
    // strf biCompression at: 12+8(hdrl)+4+8+56(avih)+8+4(strl)+8+56(strh)+8(strf hdr)+16
    put32(compressed, 12 + 8 + 4 + 8 + 56 + 8 + 4 + 8 + 56 + 8 + 16, 1)
    AviCodec.decode(compressed) shouldBe None
  }

  test("sampleVideoFrames: real decode, step arithmetic, cap, corrupt rows emit nothing") {
    import spark.implicits._
    val media = spark.range(30).map { id =>
      val bytes =
        if (id % 9 == 4) Array[Byte](1) // corrupt container
        else Multimodal.syntheticAvi(id, (3 + id % 4).toInt, (2 + id % 3).toInt,
          (2 + id % 5).toInt, microSecPerFrame = 40000L)
      (id, bytes)
    }.toDF("media_id", "bytes")
    val frames = Multimodal.sampleVideoFrames(media.repartition(5), "media_id", "bytes",
      everyMs = 80L, maxFrames = 8).collect()
    val byId = frames.groupBy(_.media_id)
    byId.keySet.exists(_ % 9 == 4) shouldBe false // corrupt rows: no frames
    (0L until 30L).filter(_ % 9 != 4).foreach { id =>
      val nf = (2 + id % 5).toInt
      val want = (0 until nf by 2).toSeq // 80 ms / 40 ms per frame = step 2
      val got = byId(id).sortBy(_.frame_idx)
      got.map(_.frame_idx).toSeq shouldBe want
      got.foreach { f =>
        f.frame_ts_ms shouldBe f.frame_idx.toLong * 40L
        val img = Multimodal.syntheticImage(id, (3 + id % 4).toInt, (2 + id % 3).toInt, f.frame_idx)
        val chans = img.pixels.map(p => ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF))
        f.sum_r shouldBe chans.map(_._1.toLong).sum
        f.checksum shouldBe chans.zipWithIndex.map { case ((r, g, b), i) =>
          (i + 1).toLong * (r + g + b) }.sum
      }
    }
    // the cap binds: everyMs below the frame clock degenerates to step 1
    val dense = Multimodal.sampleVideoFrames(media.filter(col("media_id") === 3L),
      "media_id", "bytes", everyMs = 1L, maxFrames = 2).collect()
    dense.map(_.frame_idx).sorted.toSeq shouldBe Seq(0, 1)
  }

  test("extractMediaFeatures: unified cross-modal dispatch, real codecs, mismatches flagged") {
    import spark.implicits._
    import Multimodal._
    def pixelChecksum(img: DecodedImage): Long =
      img.pixels.zipWithIndex.map { case (p, i) =>
        (i + 1).toLong * (((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)) }.sum
    val media = spark.range(36).map { id =>
      (id % 3) match {
        case 0 =>
          val img = syntheticImage(id, (4 + id % 5).toInt, (5 + id % 4).toInt)
          // BMP and compressed PNG interleave in ONE binary column
          (id, "image", if (id % 2 == 0) BmpCodec.encode(img) else PngCodec.encode(img))
        case 1 =>
          // id 7: image bytes mislabeled audio — the audio codec must refuse
          if (id == 7L) (id, "audio", BmpCodec.encode(syntheticImage(id, 3, 3)))
          else (id, "audio", WavCodec.encode(syntheticWavSamples(id, 50), 8000, 1))
        case _ =>
          if (id == 11L) (id, "video", Array[Byte](1, 2, 3)) // corrupt container
          else (id, "video", syntheticAvi(id, 3, 2, (2 + id % 3).toInt))
      }
    }.toDF("media_id", "kind", "bytes")
    val feats = extractMediaFeatures(media.repartition(5), "media_id", "kind", "bytes")
      .collect().sortBy(_.media_id)
    feats.length shouldBe 36
    feats.foreach { f =>
      if (f.media_id == 7L || f.media_id == 11L) {
        f.decode_ok shouldBe false
        (f.width, f.height, f.duration_ms, f.units, f.checksum) shouldBe
          ((-1, -1, -1L, -1L, -1L))
      } else (f.media_id % 3) match {
        case 0 =>
          val img = syntheticImage(f.media_id, (4 + f.media_id % 5).toInt, (5 + f.media_id % 4).toInt)
          (f.kind, f.decode_ok) shouldBe (("image", true))
          (f.width, f.height, f.duration_ms) shouldBe ((img.width, img.height, -1L))
          f.units shouldBe img.width.toLong * img.height
          f.checksum shouldBe pixelChecksum(img)
        case 1 =>
          (f.kind, f.decode_ok) shouldBe (("audio", true))
          (f.width, f.height) shouldBe ((-1, -1))
          f.duration_ms shouldBe 6L // 50 frames / 8000 Hz
          f.units shouldBe 50L
          f.checksum shouldBe syntheticWavSamples(f.media_id, 50).map(_.toLong).sum
        case _ =>
          val nf = (2 + f.media_id % 3).toInt
          (f.kind, f.decode_ok) shouldBe (("video", true))
          (f.width, f.height, f.duration_ms, f.units) shouldBe ((3, 2, nf * 40L, nf.toLong))
          f.checksum shouldBe (0 until nf).map(i =>
            pixelChecksum(syntheticImage(f.media_id, 3, 2, i))).sum
      }
    }
  }

  test("resize plan computes pushdown-friendly metadata") {
    val media = Multimodal.syntheticMedia(spark, 20L).toDF()
    val resized = Multimodal.resizePlan(media.filter(col("kind") === "image"), 256)
    val rows = resized.select("width", "height", "target_width", "target_height").collect()
    rows.foreach { r =>
      math.max(r.getInt(2), r.getInt(3)) should be <= 256
    }
  }
}
