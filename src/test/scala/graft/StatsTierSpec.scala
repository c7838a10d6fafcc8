package graft.engine

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft._
import graft.io.{ColumnStat, DataFile, SnapTable}

/** Metadata-only validation tier ([[Validator.validateSnapStatsFirst]]):
  * verdicts decided from the snap manifest's footer statistics must be
  * BYTE-IDENTICAL to the scanning path's on every count/message, across
  * NULLs, NaNs, boundary values and evolved schemas — the manifest is an
  * index, never a second source of truth. */
class StatsTierSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"statstier-$tag").toString

  /** 400 rows clustered into 4 id-tight files: id 0..399, score = id with
    * NULLs every 10th row, val double with NULLs (every 7th) and NaNs
    * (every 13th), name string with NULLs (every 11th), ts = epoch + id
    * seconds. */
  private def messyTable(dir: String): Unit = {
    val df = spark.range(0, 400).select(
      col("id"),
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id")).as("score"),
      when(col("id") % 7 === 0, lit(null))
        .when(col("id") % 13 === 0, lit(Double.NaN))
        .otherwise(col("id").cast("double") / 4).as("val"),
      when(col("id") % 11 === 0, lit(null))
        .otherwise(concat(lit("u"), col("id"))).as("name"),
      timestamp_seconds(lit(1700000000L) + col("id")).as("ts"))
    SnapTable.create(spark, dir, SnapTable.clustered(df, "id", 4))
    ()
  }

  private def cfg(rules: ValidationRule*): ValidationConfig =
    ValidationConfig(tables = Seq(TableConfig("t", rules = rules)))

  private val suite = Seq(
    ValidationRule("name_complete", RuleType.Completeness, Seq("name")),
    ValidationRule("score_complete", RuleType.Completeness, Seq("score")),
    ValidationRule("val_complete", RuleType.Completeness, Seq("val")), // NaN → engine
    ValidationRule("id_inside", RuleType.Range, Seq("id"),
      parameters = Map("min" -> "0", "max" -> "100000")),
    ValidationRule("id_boundary", RuleType.Range, Seq("id"),
      parameters = Map("min" -> "150", "max" -> "320")),
    ValidationRule("score_low", RuleType.Range, Seq("score"),
      parameters = Map("min" -> "100")),
    ValidationRule("val_range", RuleType.Range, Seq("val"), // double → engine
      parameters = Map("min" -> "0", "max" -> "50")),
    ValidationRule("size", RuleType.RowCount, Seq(),
      parameters = Map("min_rows" -> "1")),
    ValidationRule("fresh", RuleType.Freshness, Seq("ts"),
      parameters = Map("max_age_seconds" -> "200",
        // reference = 1700000400; cutoff − 200 s = 1700000200 → ids 0..199
        // are strictly older (id 200 sits ON the cutoff: not stale)
        "reference_time" -> "2023-11-14T22:20:00Z")),
    ValidationRule("name_pattern", RuleType.Pattern, Seq("name"), // engine
      parameters = Map("pattern" -> "^u\\d+$")))

  test("stats-first ≡ full scan on every count, message and verdict") {
    val dir = freshDir("equiv")
    messyTable(dir)
    val v = new Validator(spark, cfg(suite: _*))
    val stats = v.validateSnapStatsFirst(dir, "t")
    val full = new Validator(spark, cfg(suite: _*))
      .validateTable(SnapTable.read(spark, dir), "t")
    stats.results.size shouldBe full.results.size
    stats.results.zip(full.results).foreach { case (s, f) =>
      withClue(s.rule_name) {
        s.rule_name shouldBe f.rule_name
        s.failed_count shouldBe f.failed_count
        s.total_count shouldBe f.total_count
        s.passed shouldBe f.passed
        s.message shouldBe f.message
      }
    }
    // sanity against hand-derived ground truth (not just path agreement)
    val byName = stats.results.map(r => r.rule_name -> r).toMap
    byName("name_complete").failed_count shouldBe 37   // id % 11 == 0
    byName("score_complete").failed_count shouldBe 40  // id % 10 == 0
    byName("id_boundary").failed_count shouldBe (400 - (320 - 150 + 1))
    byName("score_low").failed_count shouldBe          // non-null scores < 100
      (0 until 400).count(i => i % 10 != 0 && i < 100).toLong
    byName("fresh").failed_count shouldBe              // ts < epoch+200, id%7 irrelevant
      (0 until 200).size.toLong
  }

  test("decided rules carry the tier marker; engine rules don't") {
    val dir = freshDir("marker")
    messyTable(dir)
    val res = new Validator(spark, cfg(suite: _*))
      .validateSnapStatsFirst(dir, "t").results
    val byName = res.map(r => r.rule_name -> r).toMap
    val decided = Seq("name_complete", "score_complete", "id_inside",
      "id_boundary", "score_low", "size", "fresh")
    decided.foreach(n => byName(n).metadata.get("tier") shouldBe Some("stats"))
    Seq("val_complete", "val_range", "name_pattern")
      .foreach(n => byName(n).metadata.get("tier") shouldBe None)
    // the all-inside range decided without touching a single file; the
    // boundary rule scanned SOME files but provably not all of them
    byName("id_inside").metadata("files_scanned") shouldBe "0"
    val scanned = byName("id_boundary").metadata("files_scanned").toInt
    val total = byName("id_boundary").metadata("files_total").toInt
    scanned should be > 0
    scanned should be < total
    byName("name_complete").metadata("files_scanned") shouldBe "0"
  }

  test("a fully stats-decidable suite runs ZERO Spark jobs") {
    val dir = freshDir("zerojobs")
    messyTable(dir)
    val zeroScan = Seq(
      ValidationRule("c", RuleType.Completeness, Seq("name")),
      ValidationRule("r", RuleType.Range, Seq("id"),
        parameters = Map("min" -> "0", "max" -> "100000")),
      ValidationRule("n", RuleType.RowCount, Seq(),
        parameters = Map("min_rows" -> "1")))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val res = new Validator(spark, cfg(zeroScan: _*))
        .validateSnapStatsFirst(dir, "t").results
      res.foreach(_.metadata.get("tier") shouldBe Some("stats"))
      Thread.sleep(1000) // listener bus delivery
      jobs.get shouldBe 0
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("schema evolution: completeness counts pre-evolution files as all-NULL") {
    val dir = freshDir("evolve")
    SnapTable.create(spark, dir, spark.range(0, 100).select(col("id")))
    SnapTable.append(spark, dir, spark.range(100, 150).select(
      col("id"), concat(lit("x"), col("id")).as("extra")))
    val rules = Seq(ValidationRule("extra_complete", RuleType.Completeness, Seq("extra")))
    val s = new Validator(spark, cfg(rules: _*)).validateSnapStatsFirst(dir, "t")
    val f = new Validator(spark, cfg(rules: _*))
      .validateTable(SnapTable.read(spark, dir), "t")
    s.results.head.failed_count shouldBe 100
    s.results.head.failed_count shouldBe f.results.head.failed_count
    s.results.head.metadata("files_scanned") shouldBe "0"
  }

  test("malformed params and missing columns fail identically to the engine") {
    val dir = freshDir("errs")
    messyTable(dir)
    val bad = Seq(
      ValidationRule("no_bounds", RuleType.Range, Seq("id")), // needs min/max
      ValidationRule("ghost", RuleType.Completeness, Seq("nope")),
      ValidationRule("bad_rows", RuleType.RowCount, Seq(),
        parameters = Map("min_rows" -> "many")))
    val s = new Validator(spark, cfg(bad: _*)).validateSnapStatsFirst(dir, "t")
    val f = new Validator(spark, cfg(bad: _*))
      .validateTable(SnapTable.read(spark, dir), "t")
    s.results.zip(f.results).foreach { case (a, b) =>
      withClue(a.rule_name) {
        a.passed shouldBe b.passed
        a.failed_count shouldBe b.failed_count // −1 sentinel on both paths
        a.metadata.get("tier") shouldBe None
      }
    }
  }

  test("author-from-manifest + validate-from-manifest: a full rule cycle, zero Spark jobs") {
    // Suggest.fromSnapManifest emits exactly the stats tier's decidable
    // families (completeness under the NULL budget, ranges only on integral
    // columns at observed bounds) — so a table never read can be given a
    // rule suite AND have it verified green, both from the one manifest JSON
    val dir = freshDir("loop")
    messyTable(dir)
    val snap = SnapTable.snapshot(spark, dir)
    val rules = Suggest.fromSnapManifest(snap).map(_.rule("auto"))
    rules should not be empty
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val res = new Validator(spark, cfg(rules: _*)).validateSnapStatsFirst(dir, "t")
      res.results should not be empty
      res.results.foreach { r =>
        withClue(r.rule_name) {
          r.passed shouldBe true // self-consistent by construction
          r.metadata.get("tier") shouldBe Some("stats")
          r.metadata("files_scanned") shouldBe "0"
        }
      }
      Thread.sleep(1000) // listener bus delivery
      jobs.get shouldBe 0
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("per-file verdicts: manifest-decided partitions sum to the global and match per-file recounts") {
    val dir = freshDir("perfile")
    messyTable(dir)
    val v = new Validator(spark, cfg(suite: _*))
    val res = v.validateSnapStatsFirst(dir, "t")
    val verdicts = v.partitionVerdictsOf("t")
    val snap = SnapTable.snapshot(spark, dir)
    // row-unit decided rules get one verdict per data file; row_count (a
    // table-level rule) and engine-path rules contribute none
    val decided = Set("name_complete", "score_complete", "id_inside",
      "id_boundary", "score_low", "fresh")
    val byRule = verdicts.groupBy(_.rule_name)
    byRule.keySet shouldBe decided
    val globals = res.results.map(r => r.rule_name -> r).toMap
    decided.foreach { rn =>
      withClue(rn) {
        byRule(rn).map(_.partition).toSet shouldBe snap.files.map(_.path).toSet
        byRule(rn).map(_.failed_count).sum shouldBe globals(rn).failed_count
        byRule(rn).map(_.total_count).sum shouldBe globals(rn).total_count
      }
    }
    // ground truth per file: recount straight from each parquet file —
    // catches a misattributed boundary-scan count that still sums right
    val schema = org.apache.spark.sql.types.StructType.fromDDL(snap.schemaDdl)
    snap.files.foreach { f =>
      val fdf = spark.read.schema(schema).parquet(s"$dir/${f.path}")
      def of(rn: String) = byRule(rn).find(_.partition == f.path).get
      withClue(f.path) {
        of("name_complete").failed_count shouldBe fdf.where(col("name").isNull).count()
        of("id_boundary").failed_count shouldBe
          fdf.where(col("id") < 150 || col("id") > 320).count()
        of("fresh").failed_count shouldBe fdf.where(col("ts").isNotNull &&
          unix_micros(col("ts")) < lit(1700000200L * 1000000L)).count()
        of("id_inside").failed_count shouldBe 0L
        of("id_inside").passed shouldBe true
      }
    }
  }

  test("time travel: stats-first at @vN matches the full scan of that version") {
    val dir = freshDir("asof")
    SnapTable.create(spark, dir, spark.range(0, 100).select(col("id"),
      when(col("id") % 4 === 0, lit(null)).otherwise(col("id")).as("v")))
    // v2 appends rows that change BOTH verdicts — time travel must not see them
    SnapTable.append(spark, dir, spark.range(1000, 1100).select(
      col("id"), lit(null).cast("long").as("v")))
    val rules = Seq(
      ValidationRule("v_complete", RuleType.Completeness, Seq("v")),
      ValidationRule("id_band", RuleType.Range, Seq("id"),
        parameters = Map("min" -> "0", "max" -> "199")))
    val s1 = new Validator(spark, cfg(rules: _*))
      .validateSnapStatsFirst(dir, "t", asOf = Some(1L))
    val f1 = new Validator(spark, cfg(rules: _*))
      .validateTable(SnapTable.read(spark, dir, Some(1L)), "t")
    s1.results.zip(f1.results).foreach { case (a, b) =>
      withClue(a.rule_name) {
        a.failed_count shouldBe b.failed_count
        a.total_count shouldBe b.total_count
        a.passed shouldBe b.passed
      }
    }
    val v1 = s1.results.map(r => r.rule_name -> r).toMap
    v1("v_complete").failed_count shouldBe 25L // id % 4 == 0
    v1("id_band").failed_count shouldBe 0L
    v1("id_band").metadata("tier") shouldBe "stats"
    // the current version sees v2's violations — and the out-of-band append
    // is decided as whole-file AllFail from its footer range, zero scans
    val now = new Validator(spark, cfg(rules: _*))
      .validateSnapStatsFirst(dir, "t")
      .results.map(r => r.rule_name -> r).toMap
    now("id_band").failed_count shouldBe 100L
    now("id_band").metadata("files_scanned") shouldBe "0"
    now("v_complete").failed_count shouldBe 125L
  }

  test("per-file verdicts: pre-evolution files carry their full row count as completeness failures") {
    val dir = freshDir("evolvepv")
    SnapTable.create(spark, dir, spark.range(0, 100).select(col("id")))
    SnapTable.append(spark, dir, spark.range(100, 150).select(
      col("id"), concat(lit("x"), col("id")).as("extra")))
    val v = new Validator(spark, cfg(
      ValidationRule("extra_complete", RuleType.Completeness, Seq("extra"))))
    v.validateSnapStatsFirst(dir, "t")
    val snap = SnapTable.snapshot(spark, dir)
    val pv = v.partitionVerdictsOf("t")
    pv.size shouldBe snap.files.size
    // files written before the column existed fail every row; sum = the 100
    // pre-evolution rows — per-file lineage names exactly WHERE the gap is
    val pre = snap.files.filterNot(_.stats.contains("extra"))
    pre should not be empty
    pre.foreach { f =>
      pv.find(_.partition == f.path).get.failed_count shouldBe f.rowCount
    }
    pv.map(_.failed_count).sum shouldBe 100L
  }

  test("pure classification: every FileClass branch") {
    def file(stats: Map[String, ColumnStat], rows: Long = 100L) =
      DataFile("f", 1L, rows, stats)
    val longStat = ColumnStat("long", "10", "90", 5L, hasMinMax = true)
    // inside
    StatsTier.classifyRange(file(Map("c" -> longStat)), "c",
      Some(0.0), Some(100.0)) shouldBe StatsTier.AllPass
    // entirely out, failed = rows − nulls
    StatsTier.classifyRange(file(Map("c" -> longStat)), "c",
      Some(91.0), None) shouldBe StatsTier.AllFail(95L)
    StatsTier.classifyRange(file(Map("c" -> longStat)), "c",
      None, Some(9.0)) shouldBe StatsTier.AllFail(95L)
    // straddling
    StatsTier.classifyRange(file(Map("c" -> longStat)), "c",
      Some(50.0), None) shouldBe StatsTier.NeedsScan
    // inclusive bounds: min == lo and max == hi still all-pass
    StatsTier.classifyRange(file(Map("c" -> longStat)), "c",
      Some(10.0), Some(90.0)) shouldBe StatsTier.AllPass
    // pre-evolution file: column absent → all NULL → never fails
    StatsTier.classifyRange(file(Map.empty), "c",
      Some(0.0), Some(1.0)) shouldBe StatsTier.AllPass
    // all-null file
    StatsTier.classifyRange(
      file(Map("c" -> ColumnStat("other", "", "", 100L, hasMinMax = false)), 100L),
      "c", Some(0.0), None) shouldBe StatsTier.AllPass
    // boundless but not all-null → scan
    StatsTier.classifyRange(
      file(Map("c" -> ColumnStat("other", "", "", 40L, hasMinMax = false))),
      "c", Some(0.0), None) shouldBe StatsTier.NeedsScan
    // wrong comparison kind → scan, never a guess
    StatsTier.classifyRange(
      file(Map("c" -> ColumnStat("string", "a", "z", 0L, hasMinMax = true))),
      "c", Some(0.0), None) shouldBe StatsTier.NeedsScan
    // freshness: strict < cutoff
    StatsTier.classifyFreshness(file(Map("c" -> longStat)), "c",
      10L) shouldBe StatsTier.AllPass // min == cutoff: nothing strictly older
    StatsTier.classifyFreshness(file(Map("c" -> longStat)), "c",
      91L) shouldBe StatsTier.AllFail(95L)
    StatsTier.classifyFreshness(file(Map("c" -> longStat)), "c",
      50L) shouldBe StatsTier.NeedsScan
  }
}
