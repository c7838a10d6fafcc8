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

  test("resize plan computes pushdown-friendly metadata") {
    val media = Multimodal.syntheticMedia(spark, 20L).toDF()
    val resized = Multimodal.resizePlan(media.filter(col("kind") === "image"), 256)
    val rows = resized.select("width", "height", "target_width", "target_height").collect()
    rows.foreach { r =>
      math.max(r.getInt(2), r.getInt(3)) should be <= 256
    }
  }
}
