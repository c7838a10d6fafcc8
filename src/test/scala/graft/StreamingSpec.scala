package graft

import graft.streaming.StreamValidator
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.collection.mutable

class StreamingSpec extends SparkSpec {

  test("foreachBatch micro-batch validation mirrors the batch path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(String, Option[String])]
    val input = stream.toDF().toDF("id", "payload")

    val config = ValidationConfig(tables = Seq(TableConfig("events", Seq(
      ValidationRule("payload_complete", RuleType.Completeness, Seq("payload"),
        threshold = Some(0.5))))))

    val outcomes = mutable.Buffer[StreamValidator.BatchOutcome]()
    val sink = Files.createTempDirectory("stream_sink").toString + "/clean"
    val chk = Files.createTempDirectory("stream_chk").toString

    val metricsDir = Files.createTempDirectory("stream_metrics").toString + "/m"
    val query = StreamValidator.start(spark, input, config, "events",
      checkpointDir = chk, validatedSink = Some(sink), triggerMs = 100L,
      onResult = o => outcomes.synchronized { outcomes += o },
      metricsSink = Some(metricsDir))

    stream.addData(("a", Some("x")), ("b", None), ("c", Some("y")))
    query.processAllAvailable()
    stream.addData(("d", None), ("e", None), ("f", None))
    query.processAllAvailable()
    query.stop()

    outcomes.size shouldBe 2
    val r1 = outcomes(0).summary.results.head
    r1.failed_count shouldBe 1
    r1.total_count shouldBe 3
    r1.passed shouldBe true // 2/3 >= 0.5
    val r2 = outcomes(1).summary.results.head
    r2.failed_count shouldBe 3
    r2.passed shouldBe false

    // clean rows appended across batches: only non-null payloads
    val clean = spark.read.parquet(sink)
    clean.count() shouldBe 2
    clean.filter(col("payload").isNull).count() shouldBe 0

    // per-batch metrics time-series: one row per rule per micro-batch
    val metrics = spark.read.parquet(metricsDir)
    metrics.count() shouldBe 2
    metrics.select("run_id").collect().map(_.getString(0)).toSet shouldBe
      Set("batch-0", "batch-1")
  }

  test("referential rules resolve ref tables through the streaming tableResolver") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dim = Seq("a", "c").toDF("id")
    val stream = MemoryStream[String]
    val input = stream.toDF().toDF("id")
    val config = ValidationConfig(tables = Seq(TableConfig("events", Seq(
      ValidationRule("fk", RuleType.Referential, Seq("id"),
        parameters = Map("ref_table" -> "dim"))))))

    val outcomes = mutable.Buffer[StreamValidator.BatchOutcome]()
    val chk = Files.createTempDirectory("stream_chk_ref").toString
    val query = StreamValidator.start(spark, input, config, "events",
      checkpointDir = chk, triggerMs = 100L,
      onResult = o => outcomes.synchronized { outcomes += o },
      tableResolver = n => if (n == "dim") Some(dim) else None)

    stream.addData("a", "b", "c")
    query.processAllAvailable()
    query.stop()

    val r = outcomes.head.summary.results.head
    r.failed_count shouldBe 1 // "b" is an orphan — NOT an unknown-ref_table error
    r.total_count shouldBe 3
  }

  test("curation/text expressions run unchanged inside Structured Streaming") {
    // the native expressions are deterministic per-row → streaming-safe;
    // a live ingest can chunk + enrich before it ever lands at rest
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(Long, String)]
    val enriched = stream.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        posexplode(graft.functions.chunk_texts(col("text"), 4, 1)).as(Seq("chunk_idx", "chunk")))
      .withColumn("token_count", graft.operators.TextAnalysis.tokenCount(col("chunk")))
      .withColumn("lang", graft.operators.TextAnalysis.langId(col("chunk")))
    val query = enriched.writeStream
      .format("memory").queryName("stream_chunks").outputMode("append").start()

    stream.addData((1L, "the cat and the dog sat with the fox"), (2L, "uno"))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("stream_chunks")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    // doc 1: 9 tokens, max 4 overlap 1 → stride 3 → chunks at 0,3,6
    rows.filter(_._1 == 1L).map(_._2).sorted shouldBe Array(0, 1, 2)
    rows.filter(_._1 == 1L).foreach(_._4 should be <= 4)
    rows.filter(_._1 == 2L) shouldBe Array((2L, 0, "uno", 1))
  }
}
