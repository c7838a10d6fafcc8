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

  test("resize plan computes pushdown-friendly metadata") {
    val media = Multimodal.syntheticMedia(spark, 20L).toDF()
    val resized = Multimodal.resizePlan(media.filter(col("kind") === "image"), 256)
    val rows = resized.select("width", "height", "target_width", "target_height").collect()
    rows.foreach { r =>
      math.max(r.getInt(2), r.getInt(3)) should be <= 256
    }
  }
}
