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

  test("snap: validated sink — batch-tagged commits, time-travelable clean table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(String, Option[String])]
    val input = stream.toDF().toDF("id", "payload")
    val config = ValidationConfig(tables = Seq(TableConfig("events", Seq(
      ValidationRule("payload_complete", RuleType.Completeness, Seq("payload"),
        threshold = Some(0.5))))))

    val tbl = Files.createTempDirectory("stream_snap").toString + "/clean"
    val chk = Files.createTempDirectory("stream_snap_chk").toString
    val query = StreamValidator.start(spark, input, config, "events",
      checkpointDir = chk, validatedSink = Some(s"snap:$tbl"), triggerMs = 100L)

    stream.addData(("a", Some("x")), ("b", None), ("c", Some("y")))
    query.processAllAvailable()
    stream.addData(("d", Some("z")), ("e", None))
    query.processAllAvailable()
    query.stop()

    // clean rows landed exactly once, each micro-batch one sequenced version
    val snaps = graft.io.SnapTable.versions(spark, tbl)
      .map(v => graft.io.SnapTable.snapshot(spark, tbl, Some(v)))
    snaps.map(_.batchSeq.get) shouldBe Seq(0L, 1L)
    graft.io.SnapTable.read(spark, tbl).as[(String, String)].collect().sorted shouldBe
      Array(("a", "x"), ("c", "y"), ("d", "z"))
    // a replayed micro-batch (at-least-once delivery) cannot double-append
    graft.io.SnapTable.appendBatch(spark, tbl,
      Seq(("a", "x"), ("c", "y")).toDF("id", "payload"), batchSeq = 0L) shouldBe None
    graft.io.SnapTable.read(spark, tbl).count() shouldBe 3L
    // the validated table is time-travelable: batch 1's view had 2 rows
    graft.io.SnapTable.read(spark, tbl, asOf = Some(1L)).count() shouldBe 2L
  }

  test("historyFrames: group-unit rules see across micro-batches via the snap sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(String, Long, Option[String])]
    val input = stream.toDF().toDF("conv_id", "turn_idx", "role")
    val config = ValidationConfig(tables = Seq(TableConfig("turns", Seq(
      ValidationRule("role_complete", RuleType.Completeness, Seq("role"),
        threshold = Some(0.4)),
      ValidationRule("turn_key", RuleType.Uniqueness, Seq("conv_id", "turn_idx")),
      ValidationRule("turn_seq", RuleType.Sequence, Seq("conv_id"),
        parameters = Map("index" -> "turn_idx", "start" -> "0"))))))

    val outcomes = mutable.Buffer[StreamValidator.BatchOutcome]()
    val tbl = Files.createTempDirectory("stream_hist").toString + "/clean"
    val chk = Files.createTempDirectory("stream_hist_chk").toString
    val query = StreamValidator.start(spark, input, config, "turns",
      checkpointDir = chk, validatedSink = Some(s"snap:$tbl"), triggerMs = 100L,
      onResult = o => outcomes.synchronized { outcomes += o },
      historyFrames = true)

    // batch 0: no history yet — plain per-batch path (no frame markers)
    stream.addData(("a", 0L, Some("user")), ("a", 1L, Some("assistant")),
      ("b", 0L, Some("user")))
    query.processAllAvailable()
    // batch 1: a CONTINUATION of conversation a (must not read as a start
    // gap), plus a row duplicating b's HISTORICAL key (must be caught —
    // within this batch alone it is unique)
    stream.addData(("a", 2L, Some("user")), ("b", 0L, Some("tool")))
    query.processAllAvailable()
    query.stop()

    outcomes.size shouldBe 2
    val b0 = outcomes(0).summary.results.map(r => r.rule_name -> r).toMap
    b0("turn_key").metadata.get("incremental") shouldBe None // no history yet
    b0.values.count(_.passed) shouldBe 3

    val b1 = outcomes(1).summary.results.map(r => r.rule_name -> r).toMap
    // row rule: exactly the batch's 2 rows
    b1("role_complete").metadata("incremental") shouldBe "delta"
    b1("role_complete").total_count shouldBe 2L
    // uniqueness across batches: the historical duplicate of (b, 0) is
    // caught — frame = accumulated ∪ batch rows sharing the batch's keys
    b1("turn_key").metadata("incremental") shouldBe "affected_groups"
    b1("turn_key").failed_count shouldBe 1L
    b1("turn_key").passed shouldBe false
    // sequence across batches: conversation a is 0,1 (history) + 2 (batch)
    // — dense, NOT a gap; b is 0 twice — still dense. Affected groups a, b.
    b1("turn_seq").metadata("incremental") shouldBe "affected_groups"
    b1("turn_seq").total_count shouldBe 2L
    b1("turn_seq").failed_count shouldBe 0L
  }

  test("streaming incremental profile: lifetime profile.json covers every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(String, Double)]
    val input = stream.toDF().toDF("id", "v")
    val config = ValidationConfig(tables = Seq(TableConfig("events", Seq(
      ValidationRule("id_complete", RuleType.Completeness, Seq("id"))))))
    val chk = Files.createTempDirectory("stream_chk_p").toString
    val profDir = Files.createTempDirectory("stream_prof").toString + "/p"

    val query = StreamValidator.start(spark, input, config, "events",
      checkpointDir = chk, triggerMs = 100L, profileDir = Some(profDir))
    stream.addData(("a", 1.0), ("b", 2.0), ("c", 3.0))
    query.processAllAvailable()
    stream.addData(("d", -9.0), ("e", 50.0))
    query.processAllAvailable()
    query.stop()

    // one state per batch + the refreshed lifetime profile; batch ids are
    // zero-padded so state filenames sort by recency (the profile lineage
    // anchor's tie-break)
    val files = new java.io.File(s"$profDir/events").list().toSet
    files should contain allOf ("state_batch-000000000000.bin",
      "state_batch-000000000001.bin", "profile.json")
    val parsed = org.json4s.jackson.JsonMethods.parse(
      Files.readString(java.nio.file.Paths.get(s"$profDir/events/profile.json")))
    implicit val fmts: org.json4s.Formats = org.json4s.DefaultFormats
    (parsed \ "runs_merged").extract[Int] shouldBe 2
    val cols = (parsed \ "columns").extract[List[org.json4s.JObject]]
    val v = cols.find(c => (c \ "column").extract[String] == "v").get
    (v \ "total_count").extract[Long] shouldBe 5 // both batches, never re-read
    (v \ "min_value").extract[Option[String]] shouldBe Some("-9.0")
    (v \ "max_value").extract[Option[String]] shouldBe Some("50.0")
  }

  test("group-unit and fused-predicate families validate inside a micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[(String, Int, Long)]
    val input = stream.toDF().toDF("conv_id", "turn_idx", "v")
    val config = ValidationConfig(tables = Seq(TableConfig("turns", Seq(
      ValidationRule("seq", RuleType.Sequence, Seq("conv_id"),
        parameters = Map("index" -> "turn_idx", "start" -> "0")),
      ValidationRule("mono", RuleType.Monotonic, Seq("conv_id"),
        parameters = Map("order_by" -> "turn_idx", "value" -> "v")),
      ValidationRule("pred", RuleType.Predicate, Seq(),
        expression = Some("v >= 0"))))))

    val outcomes = mutable.Buffer[StreamValidator.BatchOutcome]()
    val chk = Files.createTempDirectory("stream_chk2").toString
    val query = StreamValidator.start(spark, input, config, "turns",
      checkpointDir = chk, validatedSink = None, triggerMs = 100L,
      onResult = o => outcomes.synchronized { outcomes += o })
    // batch: conv a clean (0,1); conv b gapped (0,2) with a ts regression
    // shape in v and one negative v for the predicate
    stream.addData(("a", 0, 10L), ("a", 1, 20L), ("b", 0, 30L), ("b", 2, -5L))
    query.processAllAvailable()
    query.stop()

    val byName = outcomes.head.summary.results.map(r => r.rule_name -> r).toMap
    byName("seq").failed_count shouldBe 1  // b gapped
    byName("seq").total_count shouldBe 2   // group unit inside the batch
    byName("mono").failed_count shouldBe 1 // b's walk 30 → −5 regresses
    byName("pred").failed_count shouldBe 1 // the negative v
    byName("pred").metadata.get("fused") shouldBe Some("true")
  }

  test("entropy and reconciliation families validate inside a micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the streaming use case: each micro-batch's event_type mix must keep
    // its shape (entropy) and its row count must reconcile against a
    // reference snapshot resolved through the streaming tableResolver
    val ref = Seq("x", "x", "y", "y").toDF("v")
    val stream = MemoryStream[String]
    val input = stream.toDF().toDF("v")
    val config = ValidationConfig(tables = Seq(TableConfig("events", Seq(
      ValidationRule("shape", RuleType.Entropy, Seq("v"),
        parameters = Map("min_entropy" -> "0.5")),
      ValidationRule("recon", RuleType.Reconciliation, Seq(),
        parameters = Map("ref_table" -> "snapshot"))))))

    val outcomes = mutable.Buffer[StreamValidator.BatchOutcome]()
    val chk = Files.createTempDirectory("stream_chk_ent").toString
    val query = StreamValidator.start(spark, input, config, "events",
      checkpointDir = chk, triggerMs = 100L,
      onResult = o => outcomes.synchronized { outcomes += o },
      tableResolver = n => if (n == "snapshot") Some(ref) else None)

    // batch of 4 balanced values: entropy ln 2 ≥ 0.5 passes, count 4 = 4
    stream.addData("x", "x", "y", "y")
    query.processAllAvailable()
    // batch of 3 constant values: entropy 0 < 0.5 fails, count 3 ≠ 4 fails
    stream.addData("x", "x", "x")
    query.processAllAvailable()
    query.stop()

    val byBatch = outcomes.sortBy(_.batchId)
      .map(_.summary.results.map(r => r.rule_name -> r.failed_count).toMap)
    byBatch(0) shouldBe Map("shape" -> 0L, "recon" -> 0L)
    byBatch(1) shouldBe Map("shape" -> 1L, "recon" -> 1L)
  }

  test("functional_dependency and quantile families validate inside a micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the streaming use case: within each micro-batch a key must keep one
    // consistent label (FD k→label), and the batch's median value must stay
    // in band (quantile) — both through the ordinary foreachBatch path
    val stream = MemoryStream[(String, String, Double)]
    val input = stream.toDF().toDF("k", "label", "v")
    val config = ValidationConfig(tables = Seq(TableConfig("events", Seq(
      ValidationRule("fd", RuleType.FunctionalDependency, Seq("k"),
        parameters = Map("dependent" -> "label")),
      ValidationRule("p50", RuleType.Quantile, Seq("v"),
        parameters = Map("q" -> "0.5", "max_value" -> "10"))))))

    val outcomes = mutable.Buffer[StreamValidator.BatchOutcome]()
    val chk = Files.createTempDirectory("stream_chk_fd").toString
    val query = StreamValidator.start(spark, input, config, "events",
      checkpointDir = chk, triggerMs = 100L,
      onResult = o => outcomes.synchronized { outcomes += o })

    // consistent labels, median 2.0 ≤ 10: both pass
    stream.addData(("a", "x", 1.0), ("a", "x", 2.0), ("b", "y", 3.0))
    query.processAllAvailable()
    // a flips its label mid-batch; median 50 > 10: both fail
    stream.addData(("a", "x", 50.0), ("a", "z", 50.0))
    query.processAllAvailable()
    query.stop()

    val byBatch = outcomes.sortBy(_.batchId)
      .map(_.summary.results.map(r => r.rule_name -> r.failed_count).toMap)
    byBatch(0) shouldBe Map("fd" -> 0L, "p50" -> 0L)
    byBatch(1) shouldBe Map("fd" -> 1L, "p50" -> 1L)
  }

  test("diff family validates a micro-batch against a reference snapshot") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the streaming use case: each micro-batch is a keyed re-delivery that
    // must MATCH the reference snapshot row-for-row — added / removed /
    // changed keys fail, through the ordinary foreachBatch path with the
    // snapshot resolved via the streaming tableResolver
    val ref = Seq(("k1", "a"), ("k2", "b")).toDF("id", "v")
    val stream = MemoryStream[(String, String)]
    val input = stream.toDF().toDF("id", "v")
    val config = ValidationConfig(tables = Seq(TableConfig("events", Seq(
      ValidationRule("d", RuleType.Diff, Seq("id"),
        parameters = Map("ref_table" -> "snapshot"))))))

    val outcomes = mutable.Buffer[StreamValidator.BatchOutcome]()
    val chk = Files.createTempDirectory("stream_chk_diff").toString
    val query = StreamValidator.start(spark, input, config, "events",
      checkpointDir = chk, triggerMs = 100L,
      onResult = o => outcomes.synchronized { outcomes += o },
      tableResolver = n => if (n == "snapshot") Some(ref) else None)

    // exact re-delivery: every key equal
    stream.addData(("k1", "a"), ("k2", "b"))
    query.processAllAvailable()
    // k2 changed content, k3 appeared, k1 vanished: 3 of 3 keys differ
    stream.addData(("k2", "X"), ("k3", "c"))
    query.processAllAvailable()
    query.stop()

    val byBatch = outcomes.sortBy(_.batchId)
      .map(_.summary.results.map(r => (r.failed_count, r.total_count)).head)
    byBatch(0) shouldBe ((0L, 2L))
    byBatch(1) shouldBe ((3L, 3L))
  }

  test("legacy unpadded batch states migrate to the padded scheme, replay duplicates retired") {
    val dir = Files.createTempDirectory("legacy_states").toString
    def touch(n: String, body: String): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$dir/$n"), body)
    touch("state_batch-3.bin", "legacy3") // pre-upgrade, no padded twin → renamed
    touch("state_batch-7.bin", "legacy7") // pre-upgrade duplicate of a replayed batch
    touch("state_batch-000000000007.bin", "padded7") // the replay's own state
    touch("profile.json", "{}") // untouched bystander
    StreamValidator.migrateLegacyStates(dir)
    val names = new java.io.File(dir).list().toSet
    names shouldBe Set("state_batch-000000000003.bin",
      "state_batch-000000000007.bin", "profile.json")
    // the renamed file carries the legacy data; the replay duplicate was
    // RETIRED, not allowed to overwrite the newer padded state
    Files.readString(java.nio.file.Paths.get(s"$dir/state_batch-000000000003.bin")) shouldBe "legacy3"
    Files.readString(java.nio.file.Paths.get(s"$dir/state_batch-000000000007.bin")) shouldBe "padded7"
    // idempotent, and a missing directory is a no-op
    StreamValidator.migrateLegacyStates(dir)
    new java.io.File(dir).list().toSet shouldBe names
    StreamValidator.migrateLegacyStates(s"$dir/nope")
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

  test("streaming ingest: each batch detects against the on-disk index, then is absorbed") {
    import graft.operators.Dedup
    import graft.streaming.StreamIngest
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // seed the on-disk index with a 2-doc corpus
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (2L, "completely unrelated seed content about databases and storage engines"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("stream_index").toString
    Dedup.writeSignatureIndex(
      Dedup.buildSignatureIndex(corpus, "doc_id", "text", 3, 64, 16), dir, buckets = 4)

    val reports = mutable.Buffer[StreamIngest.IngestBatch]()
    val pairsDir = Files.createTempDirectory("stream_pairs").toString + "/pairs"
    val stream = MemoryStream[(Long, String)]
    val query = StreamIngest.start(spark,
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", dir,
      checkpointDir = Files.createTempDirectory("stream_ing_chk").toString,
      shingleSize = 3, numHashes = 64, bands = 16, minJaccard = 0.5,
      pairsSink = Some(pairsDir), triggerMs = 100L,
      onBatch = r => reports.synchronized { reports += r })

    // batch 1: a near-dup of corpus doc 1 + a NOVEL doc
    stream.addData(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (102L, "a genuinely novel document describing orbital mechanics and launch windows"))
    query.processAllAvailable()
    // batch 2: a near-dup of batch 1's NOVEL doc (only findable if the
    // absorb step made batch 1 visible) PLUS two docs that near-dup EACH
    // OTHER within this same batch (in neither the index nor history)
    stream.addData(
      (201L, "a genuinely novel document describing orbital mechanics and launch timing"),
      (202L, "fresh intra batch content about tokenizers and vocabularies for models"),
      (203L, "fresh intra batch content about tokenizers and vocabularies for training"))
    query.processAllAvailable()
    query.stop()

    val pairs = spark.read.parquet(pairsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs should contain((101L, 1L))   // batch 1 vs the seeded corpus
    pairs should contain((201L, 102L)) // batch 2 vs an ABSORBED batch-1 doc
    pairs should contain((202L, 203L)) // intra-batch pair, same trigger
    reports.map(_.docs) shouldBe mutable.Buffer(2L, 3L)
    reports.map(_.nearDupPairs).sum.toInt shouldBe pairs.size
  }

  test("streaming ingest replay: no duplicate pairs, no double-appended signatures") {
    import graft.operators.Dedup
    import graft.streaming.StreamIngest
    import spark.implicits._

    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (2L, "completely unrelated seed content about databases and storage engines"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("replay_index").toString
    Dedup.writeSignatureIndex(
      Dedup.buildSignatureIndex(corpus, "doc_id", "text", 3, 64, 16), dir, buckets = 4)
    val pairsDir = Files.createTempDirectory("replay_pairs").toString + "/pairs"

    val batch = Seq(
      (301L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (302L, "a genuinely novel document describing tide tables and lunar cycles"))
      .toDF("doc_id", "text")
    def counts() = (
      spark.read.parquet(s"$dir/bands").count(),
      spark.read.parquet(s"$dir/docs").count(),
      spark.read.parquet(pairsDir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    def run() = StreamIngest.ingestBatch(batch, 0L, "doc_id", "text", dir,
      shingleSize = 3, numHashes = 64, bands = 16, minJaccard = 0.5,
      pairsSink = Some(pairsDir))

    val first = run()
    first.map(_.docs) shouldBe Some(2L)
    val committed = counts()
    committed._3 should contain ((301L, 1L))

    // replay AFTER full commit (crash between commit and the streaming
    // checkpoint write): every side effect — index append, pairs write,
    // metrics callback — must be skipped
    run() shouldBe None
    counts() shouldBe committed

    // replay of a CRASHED attempt (intent written, append landed, commit
    // marker never made it): recovery deletes exactly the crashed
    // attempt's files and the re-run appends once — never twice
    val commitMarker = java.nio.file.Paths.get(dir, "_ingest_ledger", f"${0L}%020d.commit")
    java.nio.file.Files.delete(commitMarker)
    val rerun = run()
    rerun.map(_.docs) shouldBe Some(2L)
    rerun.map(_.nearDupPairs) shouldBe first.map(_.nearDupPairs)
    counts() shouldBe committed
    java.nio.file.Files.exists(commitMarker) shouldBe true

    // the committed index state is semantically intact: a later batch
    // still finds its near-dup among the absorbed (non-duplicated) docs
    val batch2 = Seq(
      (401L, "a genuinely novel document describing tide tables and lunar phases"))
      .toDF("doc_id", "text")
    val r2 = StreamIngest.ingestBatch(batch2, 1L, "doc_id", "text", dir,
      shingleSize = 3, numHashes = 64, bands = 16, minJaccard = 0.5,
      pairsSink = Some(pairsDir))
    r2.map(_.nearDupPairs) shouldBe Some(1L)
    spark.read.parquet(pairsDir).collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet should contain ((401L, 302L))
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
