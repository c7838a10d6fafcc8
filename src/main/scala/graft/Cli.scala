package graft

import graft.config.ConfigLoader
import graft.engine.Validator
import graft.io.Tables
import graft.state.Checkpoint
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}

/** CLI entry point: `spark-submit --class graft.Cli app.jar --config c.yaml
  * --sources s.yaml --output report.json [--table t] [--clean-dir DIR]
  * [--annotate-dir DIR] [--metrics-dir DIR] [--profile-dir DIR]
  * [--anomaly-gate alerts.json
  * [--anomaly-window N] [--anomaly-max-z Z] [--anomaly-min-delta D]]
  * [--emit-job-spec spec.json] [--tags hourly,critical] [--incremental]
  * [--stats-tier] [--set key=value]...`.
  * Mirrors the reference CLI contract (`/root/reference/src/data_validator/
  * cli.py:15-74`): sources YAML maps table name → path; report JSON written
  * to --output or stdout. Repeated `--set engine__type=duckdb` args form the
  * caller override map (highest precedence — the reference's widget layer,
  * `settings.py:76-105`).
  *
  * Config-authoring mode: `--suggest-config out.yaml --sources s.yaml
  * [--table t]` profiles each source table and writes a STARTER config
  * whose suggested rules the data provably passes (the Deequ
  * ConstraintSuggestion workflow) — feed it straight back via --config.
  * With `--from-profile DIR` (a `--profile-dir` directory) the rules are
  * authored ZERO-SCAN from each table's lifetime profile states instead —
  * no Spark session, no row read.
  */
object Cli {

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args.toList)
    opts.get("suggest-config") match {
      case Some(out) => runSuggest(opts, out)
      case None      => runValidation(opts)
    }
  }

  private def runSuggest(opts: Map[String, String], out: String): Unit =
    opts.get("from-profile") match {
      case Some(dir) =>
        // zero-scan authoring: rules come from the persisted profile
        // states `--profile-dir` already paid for — no Spark session, no
        // data read at all
        val sources = opts.get("sources").map(loadSources).getOrElse(Map.empty)
        val names = opts.get("table").map(Seq(_)).getOrElse {
          val p = java.nio.file.Paths.get(dir)
          if (!Files.isDirectory(p)) sys.error(s"--from-profile: no such directory $dir")
          val s = Files.list(p)
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.filter(Files.isDirectory(_))
              .map(_.getFileName.toString).toSeq.sorted
          } finally s.close()
        }
        writeSuggestedConfigFromProfiles(dir, names, sources, out)
      case None =>
        val spark = newSession("graft-suggest")
        try {
          val sources = opts.get("sources").map(loadSources)
            .getOrElse(sys.error("--suggest-config requires --sources (or --from-profile)"))
          val names = opts.get("table").map(Seq(_)).getOrElse(sources.keys.toSeq.sorted)
          writeSuggestedConfig(spark,
            names.map(n => n -> sources.getOrElse(n,
              sys.error(s"--table $n not present in --sources"))), out)
        } finally spark.stop()
    }

  /** Zero-scan variant: rules authored from each table's lifetime profile
    * state (as written by `--profile-dir`) — the config that validates
    * everything the profiles have seen, produced without reading a row.
    * The lifetime state is ALSO persisted as the table's drift baseline
    * (`suggested_baseline.bin`, outside the `state_*.bin` lineage pattern
    * so it never merges into itself), and the authored config carries
    * drift rules pointed at it — the profile is both the rule author and
    * the baseline, so the output config monitors distribution drift
    * against everything ever profiled, still without reading a row. */
  private[graft] def writeSuggestedConfigFromProfiles(profileDir: String,
      tables: Seq[String], sources: Map[String, String], out: String): ValidationConfig = {
    val cfg = ValidationConfig(tables = tables.map { n =>
      val st = graft.engine.Profiler.lifetimeState(s"$profileDir/$n").getOrElse(
        sys.error(s"--from-profile: no profile states under $profileDir/$n"))
      val baseline = s"$profileDir/$n/suggested_baseline.bin"
      graft.engine.Profiler.writeState(st, baseline)
      TableConfig(n,
        graft.engine.Suggest.fromState(st, refStatePath = Some(baseline))
          .map(_.rule("suggested")),
        source = sources.get(n))
    })
    ConfigLoader.saveYamlFile(cfg, out)
    cfg
  }

  /** Suggest rules for each (table, path) and save the starter config —
    * self-contained: table sources are embedded, so the output runs with
    * `--config out.yaml --sources s.yaml` unchanged. */
  private[graft] def writeSuggestedConfig(spark: SparkSession,
      tables: Seq[(String, String)], out: String): ValidationConfig = {
    val cfg = ValidationConfig(tables = tables.map { case (n, path) =>
      TableConfig(n, graft.engine.Suggest.suggestRules(Tables.load(spark, path)),
        source = Some(path))
    })
    ConfigLoader.saveYamlFile(cfg, out)
    cfg
  }

  /** ONE session recipe for every CLI mode (AQE + skew-join on, master
    * fallback for standalone runs) — the suggestion scans and the
    * [[SnapCli]] ingest-side maintenance must not run under a
    * differently-tuned session than validation of the same data. */
  private[graft] def newSession(appName: String,
      extraConfs: Map[String, String] = Map.empty): SparkSession = {
    val builder = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
    extraConfs.foreach { case (k, v) => builder.config(k, v) }
    // under spark-submit the master comes from the launcher; standalone
    // invocations (tests, local runs) fall back to all local cores
    if (sys.props.get("spark.master").isEmpty && sys.env.get("MASTER").isEmpty)
      builder.master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
    builder.getOrCreate()
  }

  private def runValidation(opts: Map[String, String]): Unit = {
    val configPath = opts.getOrElse("config",
      sys.error("--config is required"))

    // config FIRST: engine connection_params/options become session confs,
    // exactly like the reference's connect (`pyspark_engine.py:34-42`).
    // --tags a,b restricts the run to rules carrying any of those tags
    // (the scheduled-subset face — hourly vs nightly tiers from ONE
    // config); tables left with no rules are dropped, their scans unpaid.
    val loaded = ConfigLoader.fromYamlFile(configPath, overrides = setOverrides(opts))
    val config = opts.get("tags").map(loaded.selectTags).getOrElse(loaded)
    val spark = newSession("graft-validator",
      config.engine.connectionParams ++ config.engine.options)

    try {
      val checkpoint = config.stateFile.map(new Checkpoint(_))
      val sources: Map[String, String] = opts.get("sources")
        .map(p => loadSources(p)).getOrElse(Map.empty)

      val validator =
        new Validator(spark, config, sourceResolver(spark, sources), checkpoint)
      val incremental = opts.contains("incremental")

      // incremental tier (--incremental, snap: sources + --config state_file):
      // validate the rows committed since the checkpoint's recorded snapshot
      // version with family-aware frames (validateTableIncremental): row
      // rules see exactly the new rows, group-unit families see the affected
      // groups in full, absolute families the whole table. An up-to-date
      // table is skipped entirely (zero Spark jobs); a table whose history
      // crosses an overwrite/restore falls back to a full read (its delta
      // is not expressible as added rows).
      // the skip-completed arm mirrors Validator.validateAllTables (the
      // library face, contract-pinned in CheckpointSpec) with the
      // incremental hook threaded in front — keep the two in step
      // the rows NEW to this run per table (the incremental tier's delta, or
      // the full read when the tier fell back) — the slice --profile-dir
      // must profile: per-run states are MERGED into the lifetime profile,
      // so re-profiling the whole table under --incremental would count
      // history once per run
      val newSlices = scala.collection.mutable.Map[String, org.apache.spark.sql.DataFrame]()
      def validateOne(t: String, skipCompleted: Boolean): Option[ValidationSummary] = {
        val src = sources.getOrElse(t, t)
        if (incremental && src.startsWith("snap:") && !src.contains("@v"))
          validateSnapIncremental(spark, validator, checkpoint, t, src.stripPrefix("snap:"))
            .map { case (summary, slice) => newSlices(t) = slice; summary }
        else if (skipCompleted &&
                 checkpoint.exists(_.isCompleted(t, validator.suiteHash(t)))) None
        // stats tier (--stats-tier, snap: sources incl. @vN time travel;
        // --incremental wins when both are given — its delta frames
        // subsume the stats shortcut): manifest-provable verdicts cost
        // zero data read, the rest scan
        else if (opts.contains("stats-tier") && src.startsWith("snap:")) {
          val (d, asOf) = Tables.snapSpec(src.stripPrefix("snap:"))
          Some(validator.validateSnapStatsFirst(d, t, asOf))
        }
        else Some(validator.validateTable(Tables.load(spark, src), t))
      }

      val summaries: Map[String, ValidationSummary] = opts.get("table") match {
        case Some(t) => validateOne(t, skipCompleted = false).map(t -> _).toMap
        case None => config.tables
          .flatMap(t => validateOne(t.name, skipCompleted = true).map(t.name -> _)).toMap
      }

      // data-cleaning mode: tables flagged filter_mode additionally write
      // their rule-filtered rows to --clean-dir/<table> (reference library
      // surface `validator.py:133-162`, wired here as the CLI consumer)
      for {
        cleanDir <- opts.get("clean-dir").toSeq
        table <- config.tables if table.filterMode && summaries.contains(table.name)
      } {
        val df = Tables.load(spark, sources.getOrElse(table.name, table.name))
        validator.cleanTable(df, table.name)
          .write.mode("overwrite").parquet(s"$cleanDir/${table.name}")
      }

      // row-annotation mode (--annotate-dir DIR): every validated table is
      // written WITH the _dq_errors/_dq_warnings tag columns
      // (RulePlanner.annotate — the DQX apply_checks face): rows are
      // ROUTED by issue, never dropped — the keep-everything counterpart
      // of the filter-mode clean sink, for pipelines that quarantine with
      // context instead of discarding
      for {
        annDir <- opts.get("annotate-dir").toSeq
        table <- config.tables if summaries.contains(table.name)
      } {
        val df = Tables.load(spark, sources.getOrElse(table.name, table.name))
        graft.engine.RulePlanner.annotate(df, config.enabledRules(table.name))
          .write.mode("overwrite").parquet(s"$annDir/${table.name}")
      }

      // metrics sink: append this run's per-rule results as a time-series
      // slice (--metrics-dir), queryable over runs — the real counterpart
      // of the reference's print-only observability hooks
      // time-prefixed: run ids (and the state_<runId>.bin files they name)
      // sort by recency, so the profile lineage anchor's filename tie-break
      // agrees with mtime even on copies that flattened timestamps
      val runId = f"${System.currentTimeMillis()}%013d-${java.util.UUID.randomUUID().toString.take(8)}"
      for (metricsDir <- opts.get("metrics-dir").toSeq) {
        summaries.values.foreach(s =>
          graft.io.MetricsSink.appendSummary(spark, s, metricsDir, runId))
        // per-partition verdicts of partition_by-configured tables land in
        // their OWN subdirectory — their schema (partition column, no
        // run_ts/severity) must not mix into the summary time-series that
        // MetricsSink.anomalies reads
        summaries.keys.foreach { t =>
          graft.io.MetricsSink.appendPartitionVerdicts(spark, t,
            validator.partitionVerdictsOf(t), s"$metricsDir/partitions", runId)
        }
      }

      // incremental profiling (--profile-dir DIR): profile each validated
      // table in ONE extra pass, persist the KB-scale mergeable sketch
      // state under DIR/<table>/state_<runId>.bin, and refresh
      // DIR/<table>/profile.json with the LIFETIME profile — the merge of
      // every compatible run state, covering all data ever processed
      // without re-reading any prior run's rows (states from an older
      // schema are skipped and counted, not blended)
      // under --incremental the profiled slice is exactly what was NEW this
      // run (the snap delta; full read on first sight / fallback) — the
      // ingest-slice model the mergeable states assume. Tables skipped as
      // up to date aren't in `summaries`, so nothing re-profiles.
      for (profileDir <- opts.get("profile-dir").toSeq; t <- summaries.keys.toSeq.sorted) {
        val df = newSlices.getOrElse(t, Tables.load(spark, sources.getOrElse(t, t)))
        val res = graft.engine.Profiler.profileRun(df, s"$profileDir/$t", runId)
        Files.writeString(Paths.get(s"$profileDir/$t/profile.json"),
          Json.writeProfile(t, runId, res))
      }

      // anomaly gate (--anomaly-gate alerts.json, requires --metrics-dir):
      // after appending, compare THIS run's per-rule success_rate against
      // each rule's own trailing history in the sink and fail the run when
      // quality CHANGED — the alert a fixed threshold cannot raise (a rate
      // can collapse 0.99 → 0.90 and still clear every threshold). Gate
      // parameters mirror MetricsSink.anomalies: --anomaly-window (7),
      // --anomaly-max-z (3.0), --anomaly-min-delta (0.05). Flagged rows
      // are written as JSON so the scheduler's failure artifact names
      // exactly what moved and by how much.
      val anomalyAlerts: Seq[AnomalyAlert] = opts.get("anomaly-gate") match {
        case None => Nil
        case Some(out) =>
          val metricsDir = opts.getOrElse("metrics-dir",
            sys.error("--anomaly-gate requires --metrics-dir (the history to gate against)"))
          val alerts = graft.io.MetricsSink.runAnomalies(spark, metricsDir, runId,
            window = opts.get("anomaly-window").map(_.toInt).getOrElse(7),
            maxZ = opts.get("anomaly-max-z").map(_.toDouble).getOrElse(3.0),
            minAbsDelta = opts.get("anomaly-min-delta").map(_.toDouble).getOrElse(0.05))
            .collect().toSeq.map { r =>
              AnomalyAlert(
                table_name = r.getAs[String]("table_name"),
                rule_name = r.getAs[String]("rule_name"),
                run_id = r.getAs[String]("run_id"),
                success_rate = r.getAs[Double]("success_rate"),
                trailing_mean = r.getAs[Double]("trailing_mean"),
                trailing_std = r.getAs[Double]("trailing_std"),
                n_history = r.getAs[Long]("n_history"),
                deviation = r.getAs[Double]("deviation"))
            }
          Files.writeString(Paths.get(out), Json.writeAnomalies(alerts))
          alerts
      }

      // deployment emission (--emit-job-spec out.json): render THIS
      // invocation as a vendor-neutral batch job spec carrying each
      // filterable rule's DLT-style keep-predicate, rendered against the
      // live table schema and keyed "<table>.<rule>" — the reference's
      // create_validation_job + _create_dlt_expectations surfaces
      // (databricks_utils.py:31-93, validator.py:252-262) fused into one
      // real artifact a scheduler or DLT migrator consumes directly.
      for (out <- opts.get("emit-job-spec")) {
        val tables = summaries.keys.toSeq.sorted
          .map(t => t -> Tables.load(spark, sources.getOrElse(t, t)))
        // every run-shaping flag rides the emitted argv — the scheduled
        // job must reproduce THIS invocation (its tier, its table subset,
        // its overrides), because the expectations were rendered from it
        val shapingArgs =
          opts.get("table").toSeq.flatMap(t => Seq("--table", t)) ++
          opts.get("tags").toSeq.flatMap(t => Seq("--tags", t)) ++
          opts.get("set").toSeq.flatMap(_.split("\u0000"))
            .flatMap(kv => Seq("--set", kv))
        val spec = jobSpecFor(validator, tables, configPath,
          opts.get("sources"), opts.get("output"), shapingArgs)
        Files.writeString(Paths.get(out), graft.deploy.JobSpec.toJson(spec))
      }

      val report = validator.report(summaries)
      val json = Json.write(report)
      opts.get("output") match {
        case Some(path) => Files.writeString(Paths.get(path), json)
        case None       => println(json)
      }
      if (report.overall_stats.total_failed > 0 || anomalyAlerts.nonEmpty) sys.exit(1)
    } finally spark.stop()
  }

  /** The run's table-name resolver, in precedence order: the `--sources`
    * mapping (logical names win — a config can rebind anything), then an
    * EXPLICIT source spec loaded directly (so a rule param can say
    * `ref_table: snap:/warehouse/events@v12` and drift/diff/reconciliation
    * compare against a time-traveled snapshot with no sources entry),
    * else the session catalog. Under Try: an unresolvable name is the
    * rule's own error path ("unknown ref_table"), never a CLI abort. */
  private[graft] def sourceResolver(spark: SparkSession,
      sources: Map[String, String])(name: String): Option[org.apache.spark.sql.DataFrame] =
    sources.get(name).map(Tables.load(spark, _))
      .orElse(
        if (Tables.isExplicitSpec(name))
          scala.util.Try(Tables.load(spark, name)).toOption
        else scala.util.Try(spark.table(name)).toOption)

  /** One table of the incremental tier: None when the checkpoint already
    * covers the table's current snapshot (zero Spark jobs); otherwise
    * validates exactly the rows committed since the recorded version,
    * advances the cursor, and returns the summary WITH the new-rows slice
    * it validated (the delta, or the full read on fallback — the frame
    * `--profile-dir` profiles as this run's ingest slice). Falls back to a
    * FULL read whenever the recorded cursor cannot prove it describes this
    * table's lineage: first sight, lineage-id mismatch (the snap dir was
    * wiped and recreated — its version counter restarting must not let a
    * stale cursor skip or empty-validate the new data), a cursor ahead of
    * the table, or an overwrite/restore inside the range. */
  private[graft] def validateSnapIncremental(spark: SparkSession,
      validator: Validator, checkpoint: Option[Checkpoint],
      t: String, dir: String): Option[(ValidationSummary, DataFrame)] = {
    val snap = graft.io.SnapTable.snapshot(spark, dir)
    val cur = snap.version
    // the cursor only carries meaning under the suite that advanced it:
    // rows validated up to version v were validated by THAT suite. If the
    // suite changed since (threshold edit, new rule), both the skip and
    // the delta-only fast path would leave history unvalidated under the
    // new rules — fall back to a full run, which re-stamps the hash.
    // Hash-less entries (legacy checkpoints) keep the old trust-the-cursor
    // contract.
    val suiteUnchanged = checkpoint.flatMap(_.tableState(t))
      .map(_.suiteHash).forall(h => h.isEmpty || h == validator.suiteHash(t))
    checkpoint.flatMap(_.recordedSnapCursor(t)) match {
      case Some((recId, v)) if recId == snap.tableId && v == cur
                            && suiteUnchanged => None
      case recorded =>
        val delta = recorded match {
          case Some((recId, v)) if recId == snap.tableId && v < cur
                                && suiteUnchanged =>
            scala.util.Try(graft.io.SnapTable.changes(spark, dir, v, Some(cur))).toOption
          case _ => None
        }
        val out = delta match {
          // appended-rows fast path: family-aware frames — row rules on the
          // delta, group-unit rules on the affected groups in full (whole
          // conversations revalidated, cross-batch duplicates caught),
          // absolute families on the full table (Validator scaladoc). The
          // table side of each group semi-join goes through readTouchedBy:
          // on a key-clustered layout only the files whose key range the
          // delta touches are scanned — "revalidate the affected
          // conversations" reads O(affected files), not the table
          case Some(d) => (validator.validateTableIncremental(
            graft.io.SnapTable.read(spark, dir), d, t,
            tableFrameForKeys = Some(keys =>
              graft.io.SnapTable.readTouchedBy(spark, dir, keys.head, d))), d)
          case None =>
            val full = graft.io.SnapTable.read(spark, dir)
            (validator.validateTable(full, t), full)
        }
        checkpoint.foreach(_.recordSnapshot(t, Checkpoint.snapCursor(snap.tableId, cur)))
        Some(out)
    }
  }

  /** The `--emit-job-spec` artifact: this invocation as a vendor-neutral
    * batch [[graft.deploy.JobSpec]], DLT-style expectations rendered per
    * table against the LIVE schema and keyed `<table>.<rule>`.
    * `shapingArgs` are the run-shaping flags of the invocation
    * (`--tags`/`--table`/`--set`), appended verbatim to the argv — the
    * scheduled job must re-run the SAME selection the expectations were
    * rendered from, not the full config. */
  private[graft] def jobSpecFor(validator: Validator,
      tables: Seq[(String, org.apache.spark.sql.DataFrame)], configPath: String,
      sourcesPath: Option[String], outputPath: Option[String],
      shapingArgs: Seq[String] = Nil): graft.deploy.JobSpec = {
    val spec = graft.deploy.JobSpec.batch(
      jobName = "graft-validation",
      configPath = configPath,
      sourcesPath = sourcesPath,
      outputPath = outputPath,
      dltExpectations = tables.flatMap { case (t, df) =>
        validator.dltExpectations(df, t).map { case (n, p) => s"$t.$n" -> p }
      }.toMap)
    if (shapingArgs.isEmpty) spec
    else spec.copy(arguments = spec.arguments ++ shapingArgs)
  }

  private[graft] def parseArgs(args: List[String], acc: Map[String, String] = Map.empty): Map[String, String] =
    args match {
      // --set accumulates (every occurrence kept); other flags last-wins
      case "--set" :: kv :: rest =>
        parseArgs(rest, acc + ("set" -> acc.get("set").map(_ + "\u0000" + kv).getOrElse(kv)))
      // bare flag (no value): snap: sources validate only rows newer than
      // the checkpoint's recorded snapshot version
      case "--incremental" :: rest =>
        parseArgs(rest, acc + ("incremental" -> "true"))
      // bare flag: snap: sources decide stats-provable verdicts from the
      // manifest (completeness/row_count zero-scan; range/freshness scan
      // only boundary files) — Validator.validateSnapStatsFirst
      case "--stats-tier" :: rest =>
        parseArgs(rest, acc + ("stats-tier" -> "true"))
      case flag :: value :: rest if flag.startsWith("--") =>
        parseArgs(rest, acc + (flag.stripPrefix("--") -> value))
      case Nil => acc
      case other => sys.error(s"unparsable args: $other")
    }

  /** The accumulated `--set key=value` pairs as the ConfigLoader override
    * map (merged last — beats env overrides and YAML). */
  private[graft] def setOverrides(opts: Map[String, String]): Map[String, String] =
    opts.get("set").toSeq.flatMap(_.split("\u0000")).map { kv =>
      val i = kv.indexOf('=')
      if (i <= 0) sys.error(s"--set expects key=value, got '$kv'")
      kv.substring(0, i) -> kv.substring(i + 1)
    }.toMap

  private def loadSources(path: String): Map[String, String] = {
    import scala.jdk.CollectionConverters._
    val raw = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, Object]](Files.readString(Paths.get(path)))
    if (raw == null) Map.empty else raw.asScala.map { case (k, v) => k -> v.toString }.toMap
  }
}

/** One flagged rule of an `--anomaly-gate` run: its rate, its own trailing
  * history's mean/std, and the deviation that cleared the gate. */
final case class AnomalyAlert(
    table_name: String, rule_name: String, run_id: String,
    success_rate: Double, trailing_mean: Double, trailing_std: Double,
    n_history: Long, deviation: Double)

/** Minimal JSON writer for the report tree (no extra dependencies). */
object Json {
  import org.json4s.DefaultFormats
  import org.json4s.jackson.Serialization
  private implicit val formats: DefaultFormats.type = DefaultFormats
  def write(report: graft.engine.Report): String = Serialization.writePretty(report)
  def writeAnomalies(alerts: Seq[AnomalyAlert]): String =
    Serialization.writePretty(Map("anomalies" -> alerts))
  /** Lifetime-profile JSON for one table (`--profile-dir`). */
  def writeProfile(table: String, runId: String,
      res: graft.engine.Profiler.ProfileRunResult): String =
    Serialization.writePretty(Map(
      "table_name" -> table,
      "run_id" -> runId,
      "runs_merged" -> res.runsMerged,
      "incompatible_states_skipped" -> res.incompatibleSkipped,
      "unreadable_states_skipped" -> res.unreadableSkipped,
      "columns" -> res.profiles.map(p => Map(
        "column" -> p.column,
        "data_type" -> p.dataType,
        "total_count" -> p.total_count,
        "null_count" -> p.null_count,
        "null_rate" -> p.null_rate,
        "min_value" -> p.min_value,
        "max_value" -> p.max_value,
        "approx_distinct" -> p.approx_distinct,
        "type_conforming" -> p.type_conforming,
        "quantiles" -> p.quantiles,
        "top_items" -> p.top_items.map { case (v, c) =>
          Map("value" -> v, "count" -> c) }))))
}
