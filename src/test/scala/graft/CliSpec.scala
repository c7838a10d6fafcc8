package graft

import java.nio.file.Files
import org.json4s._
import org.json4s.jackson.JsonMethods

/** End-to-end CLI contract (reference `tests/test_cli.py:37-55`): config +
  * sources → JSON report with total_tables / table_results keys. Runs
  * `Cli`'s pipeline pieces in-process (spark-submit would fork a JVM; the
  * logic under test is identical). Also exercises the CSV source path. */
class CliSpec extends SparkSpec {
  import spark.implicits._
  private implicit val formats: Formats = DefaultFormats

  test("config → validate → JSON report round-trip, with a CSV source") {
    val dir = Files.createTempDirectory("cli")
    // CSV fixture mirroring examples/customers.csv: one null id
    val csv = dir.resolve("customers.csv")
    Files.writeString(csv, "id,name\n1,Alice\n,Bob\n3,Carol\n")

    val configYaml =
      s"""tables:
         |  - name: customers
         |    rules:
         |      - name: id_complete
         |        rule_type: completeness
         |        column: id
         |        threshold: 0.5
         |      - name: id_unique
         |        rule_type: uniqueness
         |        column: id
         |""".stripMargin
    val config = graft.config.ConfigLoader.fromYamlString(configYaml, env = Map.empty)

    val df = graft.io.Tables.load(spark, csv.toString)
    df.count() shouldBe 3
    df.schema("id").dataType.typeName shouldBe "integer" // inferSchema on

    val validator = new graft.engine.Validator(spark, config)
    val summary = validator.validateTable(df, "customers")
    summary.results.map(r => r.rule_name -> r.failed_count).toMap shouldBe
      Map("id_complete" -> 1L, "id_unique" -> 0L) // 3 distinct values incl NULL

    val report = validator.report(Map("customers" -> summary))
    val json = Json.write(report)
    val parsed = JsonMethods.parse(json)
    // exact reference shape: tests/test_cli.py:52-55 asserts total_tables
    // and "customers" in table_results; validator.py:200-228 pins the
    // nested overall_stats and per-rule key names
    (parsed \ "total_tables").extract[Int] shouldBe 1
    (parsed \ "table_results" \ "customers" \ "total_rules").extract[Int] shouldBe 2
    (parsed \ "engine_type").extract[String] shouldBe "spark"
    (parsed \ "overall_stats" \ "total_rules").extract[Int] shouldBe 2
    (parsed \ "overall_stats" \ "total_passed").extract[Int] shouldBe 2
    (parsed \ "overall_stats" \ "total_failed").extract[Int] shouldBe 0
    (parsed \ "overall_stats" \ "overall_success_rate").extract[Double] shouldBe 1.0
    (parsed \ "overall_stats" \ "total_execution_time_ms").extract[Double] should be > 0.0
    val rule0 = (parsed \ "table_results" \ "customers" \ "rules")(0)
    rule0.asInstanceOf[JObject].obj.map(_._1) shouldBe
      List("name", "type", "passed", "success_rate", "message", "severity")
    (rule0 \ "name").extract[String] shouldBe "id_complete"
    (rule0 \ "type").extract[String] shouldBe "completeness"
    // a BARE summary (not a dict) is the one keyed single_table
    validator.report(summary).table_results.keySet shouldBe Set("single_table")
  }

  test("engine connection_params/options apply to the Spark session (pyspark_engine.py:34-42)") {
    val configYaml =
      """engine:
        |  type: spark
        |  connection_params:
        |    spark.sql.shuffle.partitions: "7"
        |  options:
        |    spark.graft.test.option: "on"
        |""".stripMargin
    val config = graft.config.ConfigLoader.fromYamlString(configYaml, env = Map.empty)
    // same application step Cli.main performs before getOrCreate
    (config.engine.connectionParams ++ config.engine.options).foreach {
      case (k, v) => spark.conf.set(k, v)
    }
    spark.conf.get("spark.sql.shuffle.partitions") shouldBe "7"
    spark.conf.get("spark.graft.test.option") shouldBe "on"
    spark.conf.set("spark.sql.shuffle.partitions", "4") // restore suite default
  }

  test("filter_mode table cleaning writes rule-filtered rows") {
    val dir = Files.createTempDirectory("cliclean")
    val configYaml =
      """tables:
        |  - name: customers
        |    filter_mode: true
        |    rules:
        |      - name: id_complete
        |        rule_type: completeness
        |        column: id
        |""".stripMargin
    val config = graft.config.ConfigLoader.fromYamlString(configYaml, env = Map.empty)
    config.tables.head.filterMode shouldBe true
    val df = Seq((Some(1), "a"), (None, "b"), (Some(3), "c")).toDF("id", "name")
    val v = new graft.engine.Validator(spark, config)
    val out = s"$dir/clean/customers"
    v.cleanTable(df, "customers").write.mode("overwrite").parquet(out)
    val clean = spark.read.parquet(out)
    clean.count() shouldBe 2
    clean.filter($"id".isNull).count() shouldBe 0
  }

  test("JSON source path loads") {
    val dir = Files.createTempDirectory("clij")
    val jsonFile = dir.resolve("events.json")
    Files.writeString(jsonFile, """{"id":1,"v":"a"}
{"id":2,"v":null}
""")
    val df = graft.io.Tables.load(spark, jsonFile.toString)
    df.count() shouldBe 2
    df.filter($"v".isNull).count() shouldBe 1
  }

  test("table: prefix resolves a temp view") {
    Seq((1, "x")).toDF("a", "b").createOrReplaceTempView("cli_view")
    graft.io.Tables.load(spark, "table:cli_view").count() shouldBe 1
  }

  test("--set args accumulate into the highest-precedence override map") {
    val opts = Cli.parseArgs(List(
      "--config", "c.yaml", "--set", "engine__type=duckdb",
      "--set", "require_sql_rules=true"))
    Cli.setOverrides(opts) shouldBe
      Map("engine__type" -> "duckdb", "require_sql_rules" -> "true")
    // end to end: the --set value beats both YAML and env
    val cfg = graft.config.ConfigLoader.fromYamlString(
      "engine:\n  type: spark\n",
      env = Map("VALIDATOR_ENGINE__TYPE" -> "polars"),
      overrides = Cli.setOverrides(opts) - "require_sql_rules")
    cfg.engine.engineType shouldBe "duckdb"
  }

  test("dotted three-part names route to the catalog, not the file readers") {
    // routing proof: an unknown catalog.schema.table must fail as a CATALOG
    // lookup (table-not-found / namespace error), never as a file path
    val e = intercept[Exception](graft.io.Tables.load(spark, "main.analytics.events"))
    val msg = e.getMessage.toLowerCase
    (msg.contains("table or view") || msg.contains("namespace")) shouldBe true
    msg should not include "path does not exist"
    // a real three-part name against the session catalog resolves: external
    // parquet table created over an existing location (no warehouse write)
    val dir = Files.createTempDirectory("dotted")
    Seq(1L, 2L, 3L).toDF("id").write.mode("overwrite").parquet(s"$dir/t")
    spark.sql(s"CREATE TABLE default.graft_dotted (id BIGINT) USING parquet LOCATION '$dir/t'")
    try
      graft.io.Tables.load(spark, "spark_catalog.default.graft_dotted").count() shouldBe 3
    finally spark.sql("DROP TABLE default.graft_dotted")
  }

  test("metrics sink: runs append as a queryable time-series, date-partitioned") {
    import graft.engine.Validator
    val dir = Files.createTempDirectory("metrics").toString
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(3L), "c")).toDF("id", "name")
    val rules = Seq(ValidationRule("id_complete", RuleType.Completeness, Seq("id")))
    val v = new Validator(spark, ValidationConfig())
    val s1 = v.executeRules(df, rules, "t")
    val at1 = java.time.Instant.parse("2026-08-15T10:00:00Z")
    val at2 = java.time.Instant.parse("2026-08-16T10:00:00Z")
    graft.io.MetricsSink.appendSummary(spark, s1, dir, "run-1", at1)
    graft.io.MetricsSink.appendSummary(spark, s1, dir, "run-2", at2)
    val sink = spark.read.parquet(dir)
    sink.count() shouldBe 2 // one rule x two runs
    sink.columns should contain allOf ("run_id", "run_date", "rule_name",
      "failed_count", "success_rate")
    // date partitioning: trend queries prune to their window
    sink.where(org.apache.spark.sql.functions.col("run_date") === "2026-08-15")
      .select("run_id").head().getString(0) shouldBe "run-1"
    // per-partition verdicts sink
    val (_, verdicts) = v.executeRulesPartitioned(df, rules, "t",
      Some(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.lit(0L)),
        org.apache.spark.sql.functions.lit(2))))
    val pdir = Files.createTempDirectory("pmetrics").toString
    graft.io.MetricsSink.appendPartitionVerdicts(spark, "t", verdicts, pdir, "run-1", at1)
    spark.read.parquet(pdir).count() shouldBe verdicts.size.toLong
  }

  test("metrics anomaly detection: a rate CHANGE flags against the rule's own history") {
    import graft.io.MetricsSink
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("anom").toString
    val rule = ValidationRule("id_complete", RuleType.Completeness, Seq("id"))
    def run(i: Int, failed: Long): Unit = {
      val s = ValidationSummary.from("t",
        Seq(ValidationResult.verdict(rule, failed, 1000L, 1.0)), 1.0)
      MetricsSink.appendSummary(spark, s, dir, f"run-$i%02d",
        java.time.Instant.parse(f"2026-08-${i}%02dT10:00:00Z"))
    }
    // 8 healthy runs with mild noise (0.978..0.985), then a drop to 0.80 —
    // still possibly above a fixed threshold, but a clear CHANGE
    Seq(20L, 15L, 22L, 18L, 16L, 21L, 19L, 17L).zipWithIndex.foreach {
      case (f, i) => run(i + 1, f)
    }
    run(9, 200L)
    val flagged = MetricsSink.latestAnomalies(spark, dir, window = 7).collect()
    flagged.length shouldBe 1
    flagged.head.getAs[String]("run_id") shouldBe "run-09"
    flagged.head.getAs[Long]("n_history") shouldBe 7L
    // every healthy run is unflagged, including the FIRST (no history)
    val all = MetricsSink.anomalies(spark, dir, window = 7)
    all.filter(col("flagged") && col("run_id") =!= "run-09").count() shouldBe 0
    // flat history + infinitesimal dip: the absolute floor absorbs it
    val dir2 = Files.createTempDirectory("anom2").toString
    def run2(i: Int, failed: Long): Unit = {
      val s = ValidationSummary.from("t",
        Seq(ValidationResult.verdict(rule, failed, 1000L, 1.0)), 1.0)
      MetricsSink.appendSummary(spark, s, dir2, f"run-$i%02d",
        java.time.Instant.parse(f"2026-08-${i}%02dT10:00:00Z"))
    }
    (1 to 5).foreach(run2(_, 20L)) // std = 0
    run2(6, 25L)                   // 0.980 → 0.975: below minAbsDelta
    MetricsSink.latestAnomalies(spark, dir2, window = 7).count() shouldBe 0
  }

  test("anomaly gate: flags THIS run only, untouched tables' stale flags don't re-fire") {
    import graft.io.MetricsSink
    val dir = Files.createTempDirectory("anomgate").toString
    val rule = ValidationRule("id_complete", RuleType.Completeness, Seq("id"))
    def append(table: String, i: Int, failed: Long, runId: String): Unit = {
      val s = ValidationSummary.from(table,
        Seq(ValidationResult.verdict(rule, failed, 1000L, 1.0)), 1.0)
      MetricsSink.appendSummary(spark, s, dir, runId,
        java.time.Instant.parse(f"2026-07-${i}%02dT10:00:00Z"))
    }
    // table OTHER degraded on its LAST run days ago — a stale flag
    (1 to 7).foreach(i => append("other", i, 20L, f"old-$i%02d"))
    append("other", 8, 300L, "old-08")
    // table T: healthy history, then today's degraded run
    (9 to 16).foreach(i => append("t", i, 20L, f"t-$i%02d"))
    append("t", 17, 200L, "t-17")
    // the gate sees only run t-17's deviation — not other's stale one
    val flagged = MetricsSink.runAnomalies(spark, dir, "t-17").collect()
    flagged.map(_.getAs[String]("table_name")).toSeq shouldBe Seq("t")
    flagged.head.getAs[String]("run_id") shouldBe "t-17"
    // a healthy run of the same table passes the same gate
    MetricsSink.runAnomalies(spark, dir, "t-16").count() shouldBe 0
    // the alert JSON the CLI writes names what moved and by how much
    val alerts = flagged.toSeq.map { r =>
      AnomalyAlert(r.getAs[String]("table_name"), r.getAs[String]("rule_name"),
        r.getAs[String]("run_id"), r.getAs[Double]("success_rate"),
        r.getAs[Double]("trailing_mean"), r.getAs[Double]("trailing_std"),
        r.getAs[Long]("n_history"), r.getAs[Double]("deviation"))
    }
    val parsed = JsonMethods.parse(Json.writeAnomalies(alerts))
    val first = (parsed \ "anomalies")(0)
    (first \ "table_name").extract[String] shouldBe "t"
    (first \ "rule_name").extract[String] shouldBe "id_complete"
    (first \ "success_rate").extract[Double] shouldBe 0.8
    (first \ "n_history").extract[Long] shouldBe 7L
    // empty gate result still writes a well-formed document
    (JsonMethods.parse(Json.writeAnomalies(Nil)) \ "anomalies") shouldBe JArray(Nil)
  }

  test("profile-dir: per-run states merge into a lifetime profile; schema drift starts a new lineage") {
    import graft.engine.Profiler
    val dir = Files.createTempDirectory("profdir").toString + "/events"
    // run 1 profiles slice A only, run 2 slice B only — the lifetime
    // profile after run 2 must cover A ∪ B without re-reading A
    val a = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, null, 30.0)).toDF("id", "s", "d")
    val b = Seq((4L, "z", -5.0), (5L, "x", 99.0)).toDF("id", "s", "d")
    val r1 = Profiler.profileRun(a, dir, "run1")
    r1.runsMerged shouldBe 1
    r1.profiles.head.total_count shouldBe 3
    val r2 = Profiler.profileRun(b, dir, "run2")
    r2.runsMerged shouldBe 2
    r2.incompatibleSkipped shouldBe 0
    val byCol = r2.profiles.map(p => p.column -> p).toMap
    byCol("id").total_count shouldBe 5
    byCol("s").null_count shouldBe 1
    byCol("s").approx_distinct shouldBe 3L // x,y,z — exact below capacity
    byCol("d").min_value shouldBe Some("-5.0")
    byCol("d").max_value shouldBe Some("99.0")
    // run 3 arrives with a retyped column: prior states are skipped (new
    // lineage), never blended into an incompatible value space
    val c = Seq((6L, "w", "notadouble")).toDF("id", "s", "d")
    val r3 = Profiler.profileRun(c, dir, "run3")
    r3.runsMerged shouldBe 1
    r3.incompatibleSkipped shouldBe 2
    r3.profiles.head.total_count shouldBe 1
    // the CLI's JSON rendering carries the bookkeeping + per-column fields
    val parsed = JsonMethods.parse(Json.writeProfile("events", "run2", r2))
    (parsed \ "runs_merged").extract[Int] shouldBe 2
    (parsed \ "incompatible_states_skipped").extract[Int] shouldBe 0
    (parsed \ "unreadable_states_skipped").extract[Int] shouldBe 0
    val cols = (parsed \ "columns").extract[List[JObject]]
    cols.map(co => (co \ "column").extract[String]) shouldBe List("id", "s", "d")
    (cols.head \ "total_count").extract[Long] shouldBe 5
    // a CORRUPT historical state file is skipped and counted — the run
    // keeps advancing (it just persisted its own valid state), and
    // lifetimeState's zero-scan reader survives it too
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/state_run0corrupt.bin"),
      Array[Byte](1, 2, 3, 4))
    val r4 = Profiler.profileRun(c, dir, "run4")
    r4.unreadableSkipped shouldBe 1
    r4.runsMerged shouldBe 2 // run3 + run4 (the c lineage)
    Profiler.lifetimeState(dir) should not be empty
  }

  test("batch job spec carries the reference's knobs and round-trips through JSON") {
    import graft.deploy.JobSpec
    // reference create_validation_job (databricks_utils.py:49-93): 2 workers,
    // AQE + coalescePartitions, 3600 s timeout, 2 retries, retry on timeout
    val spec = JobSpec.batch("nightly_validation", "/cfg/validation.yaml",
      sourcesPath = Some("/cfg/sources.yaml"), outputPath = Some("/out/report.json"),
      scheduleCron = Some("0 2 * * *"))
    spec.timeout_seconds shouldBe 3600L
    spec.max_retries shouldBe 2
    spec.retry_on_timeout shouldBe true
    spec.cluster.num_executors shouldBe 2
    spec.cluster.spark_conf("spark.sql.adaptive.enabled") shouldBe "true"
    spec.cluster.spark_conf("spark.sql.adaptive.coalescePartitions.enabled") shouldBe "true"
    spec.main_class shouldBe "graft.Cli" // a class that actually exists
    spec.arguments shouldBe Seq("--config", "/cfg/validation.yaml",
      "--sources", "/cfg/sources.yaml", "--output", "/out/report.json")
    spec.schedule_cron shouldBe Some("0 2 * * *")
    JobSpec.fromJson(JobSpec.toJson(spec)) shouldBe spec
    val argv = JobSpec.sparkSubmitCommand(spec, "/app/graft.jar")
    argv.take(3) shouldBe Seq("spark-submit", "--class", "graft.Cli")
    argv should contain inOrderElementsOf Seq("--num-executors", "2")
    argv should contain inOrderElementsOf Seq("/app/graft.jar", "--config", "/cfg/validation.yaml")
  }

  test("job spec carries DLT-style expectations and round-trips through JSON") {
    import graft.deploy.JobSpec
    import graft.engine.RulePlanner
    // the expectations are RulePlanner's real renderings, not hand-written
    // strings — the spec is the migration artifact a DLT pipeline reads
    val df = Seq((Some(1L), "a"), (None, "b")).toDF("id", "cat")
    val exps = RulePlanner.dltExpectations(df.schema, Seq(
      ValidationRule("id_complete", RuleType.Completeness, Seq("id")),
      ValidationRule("cat_allowed", RuleType.AllowedValues, Seq("cat"),
        parameters = Map("values" -> "a,b")))).toMap
    exps should have size 2
    val spec = JobSpec.batch("nightly_validation", "/cfg/validation.yaml",
      dltExpectations = exps)
    spec.dlt_expectations shouldBe exps
    val parsed = JobSpec.fromJson(JobSpec.toJson(spec))
    parsed shouldBe spec
    // predicates survive JSON round-trip byte-for-byte (they're SQL text a
    // DLT decorator consumes verbatim)
    parsed.dlt_expectations("id_complete") shouldBe exps("id_complete")
    // legacy spec JSON without the field still parses (empty expectations)
    val legacy = org.json4s.jackson.JsonMethods.compact(
      org.json4s.jackson.JsonMethods.parse(JobSpec.toJson(spec))
        .removeField { case (k, _) => k == "dlt_expectations" })
    JobSpec.fromJson(legacy).dlt_expectations shouldBe empty
    // the CLI's --emit-job-spec assembly: configured rules rendered per
    // table against the live schema, keyed <table>.<rule>; non-row-level
    // rules (uniqueness) excluded
    val cfg = ValidationConfig(tables = Seq(TableConfig("t", rules = Seq(
      ValidationRule("id_complete", RuleType.Completeness, Seq("id")),
      ValidationRule("id_unique", RuleType.Uniqueness, Seq("id"))))))
    val cliSpec = Cli.jobSpecFor(new graft.engine.Validator(spark, cfg),
      Seq("t" -> df), "/cfg/v.yaml", Some("/cfg/s.yaml"), None)
    cliSpec.dlt_expectations.keySet shouldBe Set("t.id_complete")
    df.filter(org.apache.spark.sql.functions.expr(
      cliSpec.dlt_expectations("t.id_complete"))).count() shouldBe 1
    // the run-shaping flags are PART of the invocation: the emitted job
    // must re-run the same tier/subset its expectations were rendered from
    val tagged = Cli.jobSpecFor(new graft.engine.Validator(spark, cfg),
      Seq("t" -> df), "/cfg/v.yaml", None, None,
      shapingArgs = Seq("--table", "t", "--tags", "hourly", "--set", "engine__type=spark"))
    tagged.arguments should contain inOrderElementsOf Seq("--tags", "hourly")
    tagged.arguments should contain inOrderElementsOf Seq("--table", "t")
    tagged.arguments should contain inOrderElementsOf Seq("--set", "engine__type=spark")
  }

  test("deployment examples: specs, launch scripts, and guide render from the live JobSpec values") {
    import graft.deploy.{DeployDocs, JobSpec}
    val dir = Files.createTempDirectory("deploydocs").toString
    val written = DeployDocs.saveConfigurationExamples(dir, "/cfg/v.yaml", "/app/graft.jar")
    written.map(p => p.substring(p.lastIndexOf('/') + 1)).sorted shouldBe Seq(
      "DEPLOYMENT.md", "batch_job_spec.json", "spark_submit_batch.sh",
      "spark_submit_streaming.sh", "streaming_job_spec.json")
    // the JSONs parse back into real specs with the reference knobs
    val batch = JobSpec.fromJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "batch_job_spec.json")))
    batch.timeout_seconds shouldBe 3600L
    batch.main_class shouldBe "graft.Cli"
    val streaming = JobSpec.fromJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "streaming_job_spec.json")))
    streaming.timeout_seconds shouldBe 0L
    streaming.max_retries shouldBe 5
    // the launch script IS the spec's rendered argv (no hand-written drift)
    val script = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "spark_submit_batch.sh"))
    script should include ("--class graft.Cli")
    script should include ("/app/graft.jar")
    JobSpec.sparkSubmitCommand(batch, "/app/graft.jar").foreach { a =>
      script should include (a)
    }
    // the guide quotes the real knob values, not prose constants
    val guide = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "DEPLOYMENT.md"))
    guide should include (s"timeout ${batch.timeout_seconds} s")
    guide should include (batch.schedule_cron.get)
    guide should include ("spark.sql.adaptive.enabled=true")
    guide should include ("--emit-job-spec")
  }

  test("streaming job spec: indefinite timeout, 5 retries, trigger + checkpoint as args") {
    import graft.deploy.JobSpec
    // reference create_streaming_validation_job (databricks_utils.py:95-143):
    // 3 workers, forceDeleteTempCheckpointLocation, timeout 0, 5 retries,
    // 60 s default trigger
    val spec = JobSpec.streaming("stream_validation", "/cfg/validation.yaml",
      sourceTable = "/data/incoming", checkpointLocation = "/chk/stream")
    spec.timeout_seconds shouldBe 0L
    spec.max_retries shouldBe 5
    spec.cluster.num_executors shouldBe 3
    spec.cluster.spark_conf("spark.sql.streaming.forceDeleteTempCheckpointLocation") shouldBe "true"
    spec.main_class shouldBe "graft.StreamCli"
    spec.arguments should contain inOrderElementsOf
      Seq("--stream-source", "/data/incoming")
    spec.arguments should contain inOrderElementsOf
      Seq("--checkpoint-location", "/chk/stream")
    spec.arguments should contain inOrderElementsOf Seq("--trigger-interval", "60")
    JobSpec.fromJson(JobSpec.toJson(spec)) shouldBe spec
  }

  test("ORC sources load through the same dispatch (suffix and explicit prefix)") {
    val dir = Files.createTempDirectory("orc")
    val src = dir.resolve("t.orc").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "cat").write.orc(src)
    val df = graft.io.Tables.load(spark, src)
    df.count() shouldBe 2
    graft.io.Tables.load(spark, s"orc:$src").schema.fieldNames.toSeq shouldBe Seq("id", "cat")
    // and the engine validates it like any other source
    val v = new graft.engine.Validator(spark, ValidationConfig())
    v.executeRules(df, Seq(ValidationRule("c", RuleType.Completeness, Seq("id"))), "t")
      .results.head.passed shouldBe true
  }

  test("--suggest-config authors a starter config that validates green on its source") {
    val dir = Files.createTempDirectory("suggest")
    val src = dir.resolve("t_parquet").toString
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "cat", "amt").write.parquet(src)
    val out = dir.resolve("config.yaml").toString

    val cfg = Cli.writeSuggestedConfig(spark, Seq("t" -> src), out)
    cfg.tables.head.source shouldBe Some(src)
    cfg.tables.head.rules should not be empty

    // the real CLI round trip: reload the file the flag wrote
    val loaded = graft.config.ConfigLoader.fromYamlFile(out, env = Map.empty)
    loaded.enabledRules("t") shouldBe cfg.tables.head.rules
    loaded.tables.head.source shouldBe Some(src) // self-contained sources

    // the authored config validates green on its own data — the suggestion
    // contract, through the full table pipeline
    val v = new graft.engine.Validator(spark, loaded)
    val summary = v.validateTable(graft.io.Tables.load(spark, src), "t")
    summary.failed_rules shouldBe 0
    summary.total_rules shouldBe loaded.enabledRules("t").size
  }

  test("--suggest-config --from-profile authors a config zero-scan from persisted states") {
    import graft.engine.Profiler
    val dir = Files.createTempDirectory("from_profile")
    // two ingest slices profiled on different runs (the --profile-dir shape)
    val slice1 = Seq((1L, "a"), (2L, "b")).toDF("id", "cat")
    val slice2 = Seq((3L, "c"), (4L, "a")).toDF("id", "cat")
    Profiler.profileRun(slice1, s"$dir/t", "run1")
    Profiler.profileRun(slice2, s"$dir/t", "run2")

    val out = dir.resolve("config.yaml").toString
    val cfg = Cli.writeSuggestedConfigFromProfiles(dir.toString, Seq("t"),
      sources = Map("t" -> "t_path"), out)
    cfg.tables.head.source shouldBe Some("t_path")
    val loaded = graft.config.ConfigLoader.fromYamlFile(out, env = Map.empty)
    val rules = loaded.enabledRules("t")
    rules should not be empty
    // the merged-state rules hold over the UNION of the profiled slices:
    // range spans both runs, the value set is the union vocabulary
    val byName = rules.map(r => (r.ruleType, r.columns.headOption.getOrElse("")) -> r).toMap
    byName((RuleType.Range, "id")).parameters("min") shouldBe "1.0"
    byName((RuleType.Range, "id")).parameters("max") shouldBe "4.0"
    byName((RuleType.AllowedValues, "cat")).parameters("values") shouldBe "a,b,c"
    // drift monitoring is authored too — the lifetime state was persisted
    // as the baseline and the rules point at it
    val catDrift = byName((RuleType.drift, "cat"))
    catDrift.parameters("method") shouldBe "tvd"
    catDrift.parameters("ref_state") shouldBe s"$dir/t/suggested_baseline.bin"
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/t/suggested_baseline.bin")) shouldBe true
    // and the authored config (incl. drift vs the persisted baseline)
    // validates green on the full union of the profiled slices
    val v = new graft.engine.Validator(spark, loaded)
    v.executeRules(slice1.union(slice2), rules, "t")
      .results.filterNot(_.passed) shouldBe empty
  }

  test("--incremental on a snap: source validates only newly committed rows, skips when current") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("cli-incr").toString
    val tbl = s"$dir/events_snap"
    val ckpt = s"$dir/state.json"
    def rows(lo: Int, hi: Int) = spark.range(lo, hi)
      .select(col("id"), when(col("id") % 5 === 0, lit(null)).otherwise(col("id")).as("v"))
    graft.io.SnapTable.create(spark, tbl, rows(0, 500))

    val config = graft.config.ConfigLoader.fromYamlString(
      s"""tables:
         |  - name: ev
         |    rules:
         |      - { name: v_complete, rule_type: completeness, column: v, threshold: 0.5 }
         |state_file: $ckpt
         |""".stripMargin, env = Map.empty)
    val checkpoint = Some(new graft.state.Checkpoint(ckpt))
    val validator = new graft.engine.Validator(spark, config, checkpoint = checkpoint)

    // first sight: full read, cursor recorded at v1
    val first = graft.Cli.validateSnapIncremental(spark, validator, checkpoint, "ev", tbl)
    first.get._1.results.head.total_count shouldBe 500L
    first.get._2.count() shouldBe 500L // first sight: the slice IS the full read
    checkpoint.get.recordedSnapVersion("ev") shouldBe Some(1L)

    // nothing new: zero work, summary absent (even though table is completed)
    graft.Cli.validateSnapIncremental(spark, validator, checkpoint, "ev", tbl) shouldBe None

    // growth: exactly the appended rows are revalidated; cursor advances
    graft.io.SnapTable.append(spark, tbl, rows(500, 800))
    val delta = graft.Cli.validateSnapIncremental(spark, validator, checkpoint, "ev", tbl)
    delta.get._1.results.head.total_count shouldBe 300L
    delta.get._2.count() shouldBe 300L // the profile-facing slice is the delta alone
    checkpoint.get.recordedSnapVersion("ev") shouldBe Some(2L)

    // an overwrite in the range degrades to a full read of the new truth
    graft.io.SnapTable.overwrite(spark, tbl, rows(0, 100))
    val after = graft.Cli.validateSnapIncremental(spark, validator, checkpoint, "ev", tbl)
    after.get._1.results.head.total_count shouldBe 100L
    checkpoint.get.recordedSnapVersion("ev") shouldBe Some(3L)

    // the flag parses bare (no value operand)
    val opts = graft.Cli.parseArgs(List("--config", "c.yaml", "--incremental", "--output", "r.json"))
    opts("incremental") shouldBe "true"
    opts("output") shouldBe "r.json"

    // wipe-and-recreate: the cursor's lineage id no longer matches, so the
    // run must FULLY validate the new incarnation (never an empty delta
    // that vacuously passes), and the cursor re-anchors to the new id
    def rm(f: java.io.File): Unit = { Option(f.listFiles).foreach(_.foreach(rm)); f.delete() }
    rm(new java.io.File(tbl))
    graft.io.SnapTable.create(spark, tbl, rows(0, 42))
    val recreated = graft.Cli.validateSnapIncremental(spark, validator, checkpoint, "ev", tbl)
    recreated.get._1.results.head.total_count shouldBe 42L
    graft.Cli.validateSnapIncremental(spark, validator, checkpoint, "ev", tbl) shouldBe None
  }

  test("--incremental: a suite edit invalidates the cursor — full re-validation, not a skip or delta") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("cli-incr-suite").toString
    val tbl = s"$dir/events_snap"
    val ckpt = s"$dir/state.json"
    def rows(lo: Int, hi: Int) = spark.range(lo, hi)
      .select(col("id"), when(col("id") % 5 === 0, lit(null)).otherwise(col("id")).as("v"))
    graft.io.SnapTable.create(spark, tbl, rows(0, 500))
    def configWith(threshold: Double) = graft.config.ConfigLoader.fromYamlString(
      s"""tables:
         |  - name: ev
         |    rules:
         |      - { name: v_complete, rule_type: completeness, column: v, threshold: $threshold }
         |state_file: $ckpt
         |""".stripMargin, env = Map.empty)
    val checkpoint = Some(new graft.state.Checkpoint(ckpt))
    def validatorWith(threshold: Double) =
      new graft.engine.Validator(spark, configWith(threshold), checkpoint = checkpoint)

    // run at 0.5, cursor current → same suite skips
    graft.Cli.validateSnapIncremental(spark, validatorWith(0.5), checkpoint, "ev", tbl)
      .get._1.results.head.total_count shouldBe 500L
    graft.Cli.validateSnapIncremental(spark, validatorWith(0.5), checkpoint, "ev", tbl) shouldBe None

    // threshold edit: the cursor was earned by a DIFFERENT suite — the run
    // must fully re-validate under the new rules (history was never judged
    // by them), and the fresh completion re-arms the skip for the new suite
    val rerun = graft.Cli.validateSnapIncremental(spark, validatorWith(0.9), checkpoint, "ev", tbl)
    rerun.get._1.results.head.total_count shouldBe 500L
    rerun.get._1.results.head.passed shouldBe false // 100/500 null fails 0.9
    graft.Cli.validateSnapIncremental(spark, validatorWith(0.9), checkpoint, "ev", tbl) shouldBe None

    // and with the suite stable again, growth takes the delta fast path
    graft.io.SnapTable.append(spark, tbl, rows(500, 800))
    graft.Cli.validateSnapIncremental(spark, validatorWith(0.9), checkpoint, "ev", tbl)
      .get._1.results.head.total_count shouldBe 300L
  }

  test("ref_table accepts an explicit source spec — diff/drift against a time-traveled snapshot") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("cli-refspec").toString
    val tbl = s"$dir/events_snap"
    def rows(lo: Int, hi: Int) = spark.range(lo, hi)
      .select(col("id"), (col("id") % 7).as("v"))
    graft.io.SnapTable.create(spark, tbl, rows(0, 500))   // version 1
    graft.io.SnapTable.append(spark, tbl, rows(500, 800)) // version 2 (current)

    // the PRODUCTION resolver with no --sources: specs load directly
    val v = new graft.engine.Validator(spark, ValidationConfig(),
      graft.Cli.sourceResolver(spark, Map.empty))
    val cur = graft.io.SnapTable.read(spark, tbl)

    // keyed diff vs the table's own version 1: exactly the appended keys
    val diff = v.executeRules(cur, Seq(ValidationRule("vs_v1", RuleType.Diff,
      Seq("id"), parameters = Map("ref_table" -> s"snap:$tbl@v1"))), "t").results.head
    diff.total_count shouldBe 800L // keys in the union
    diff.failed_count shouldBe 300L // all 300 new keys read as added

    // drift vs version 1: id%7 is near-uniform in both versions → no drift
    val drift = v.executeRules(cur, Seq(ValidationRule("drift_v1", RuleType.drift,
      Seq("v"), parameters = Map("ref_table" -> s"snap:$tbl@v1",
        "method" -> "tvd", "critical" -> "0.05"))), "t").results.head
    drift.failed_count shouldBe 0L
    drift.passed shouldBe true

    // a bare unresolvable name still takes the rule's own error path
    val bad = v.executeRules(cur, Seq(ValidationRule("nope", RuleType.Diff,
      Seq("id"), parameters = Map("ref_table" -> "no_such_table"))), "t").results.head
    bad.failed_count shouldBe -1L
  }

  test("--stats-tier on a snap: source decides manifest-provable verdicts, keeps the resume contract") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("cli-stats").toString
    val tbl = s"$dir/events_snap"
    val ckpt = s"$dir/state.json"
    val df = spark.range(0, 400).select(col("id"),
      when(col("id") % 5 === 0, lit(null)).otherwise(col("id")).as("v"))
    graft.io.SnapTable.create(spark, tbl, graft.io.SnapTable.clustered(df, "id", 4))

    val config = graft.config.ConfigLoader.fromYamlString(
      s"""tables:
         |  - name: ev
         |    rules:
         |      - { name: v_complete, rule_type: completeness, column: v, threshold: 0.5 }
         |      - { name: id_band, rule_type: range, column: id, parameters: { min: "100", max: "299" } }
         |state_file: $ckpt
         |""".stripMargin, env = Map.empty)
    val checkpoint = Some(new graft.state.Checkpoint(ckpt))
    val validator = new graft.engine.Validator(spark, config, checkpoint = checkpoint)

    // the CLI arm's target face: exact counts, stats-decided
    val summary = validator.validateSnapStatsFirst(tbl, "ev")
    val byName = summary.results.map(r => r.rule_name -> r).toMap
    byName("v_complete").failed_count shouldBe 80L
    byName("v_complete").metadata("tier") shouldBe "stats"
    byName("v_complete").passed shouldBe true // rate 0.8 ≥ threshold 0.5
    byName("id_band").failed_count shouldBe 200L
    byName("id_band").metadata("tier") shouldBe "stats"
    // id-clustered layout: at most the two bound-straddling files scanned
    byName("id_band").metadata("files_scanned").toInt should be <= 2
    // resume contract: completion recorded, so the skip-completed arm fires
    // on the next run exactly like the full tier
    checkpoint.get.isCompleted("ev") shouldBe true
    // per-FILE verdicts populated for the decided rules (the metrics sink
    // reads this same accessor, so --metrics-dir ships them unchanged):
    // one row per data file per decided rule, summing to the global counts
    val snap = graft.io.SnapTable.snapshot(spark, tbl)
    val pv = validator.partitionVerdictsOf("ev")
    pv.map(_.rule_name).toSet shouldBe Set("v_complete", "id_band")
    pv.count(_.rule_name == "id_band") shouldBe snap.files.size
    pv.filter(_.rule_name == "id_band").map(_.failed_count).sum shouldBe 200L
    pv.filter(_.rule_name == "v_complete").map(_.failed_count).sum shouldBe 80L
    pv.foreach(_.partition should startWith("data/"))
    // the flag parses bare (no value operand)
    graft.Cli.parseArgs(List("--stats-tier", "--output", "r.json"))("stats-tier") shouldBe "true"
  }
}
