package graft.bench

import graft._
import graft.engine.Validator
import graft.io.{SnapTable, TranscriptConfig, Transcripts}

/** Design-point probe for the stats validation tier at the bench scale
  * (SnapBench's sibling): write the 28M-turn transcripts table as a
  * ts-clustered snap table, then run the same stats-eligible suite through
  * the engine's full fused scan ([[Validator.validateTable]]) and through
  * [[Validator.validateSnapStatsFirst]]. Verdicts are REQUIRED identical
  * in-bench — the speedup is only reported for equal answers. The suite
  * deliberately mixes the tier's shapes:
  *
  *   - completeness text/role, row_count, and an all-inside turn_idx range:
  *     decided from the manifest alone, zero files scanned;
  *   - freshness at the 3/4 point of event time: on the ts-clustered
  *     layout only the boundary file(s) need scanning — the other files'
  *     footer ranges decide them wholesale;
  *   - a turn_idx ≥ 0 range the data VIOLATES sparsely (negative sentinel
  *     turns in most files): every file straddles, so the tier honestly
  *     scans them all — but reads ONE narrow int column, not the table.
  *
  * Prints ONE JSON line; numbers are min-of-3. Knobs: SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BENCH_CONVS, SPARK_GRAFT_STATSBENCH_DIR,
  * SPARK_GRAFT_SNAP_FILES. */
object StatsBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val convs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "1600000").toLong
    val dir = sys.env.getOrElse("SPARK_GRAFT_STATSBENCH_DIR", "/tmp/graft_statsbench")
    val files = sys.env.getOrElse("SPARK_GRAFT_SNAP_FILES", "64").toInt
    val spark = BenchSessions.local("graft-statsbench", cpus)
    val tbl = s"$dir/turns_snap"
    BenchSessions.wipe(spark, tbl)

    val cfg = TranscriptConfig(numConvs = convs, hotConvExtraTurns = convs / 10)
    val snap = SnapTable.create(spark, tbl,
      SnapTable.clustered(Transcripts.turns(spark, cfg), "ts", files))

    // freshness cutoff at the 3/4 point of event time, taken from the
    // manifest's own stats and rounded to a whole second so the ISO
    // reference_time is exact
    val tsStats = snap.files.flatMap(_.stats.get("ts")).filter(_.hasMinMax)
    val tsMin = tsStats.map(_.min.toLong).min
    val tsMax = tsStats.map(_.max.toLong).max
    val cutoffSec = (tsMin + 3 * (tsMax - tsMin) / 4) / 1000000L
    val refIso = java.time.Instant.ofEpochSecond(cutoffSec).toString

    val rules = Seq(
      ValidationRule("text_complete", RuleType.Completeness, Seq("text")),
      ValidationRule("role_complete", RuleType.Completeness, Seq("role")),
      ValidationRule("idx_domain", RuleType.Range, Seq("turn_idx"),
        parameters = Map("min" -> "-1", "max" -> "1000000000")),
      ValidationRule("idx_nonneg", RuleType.Range, Seq("turn_idx"),
        parameters = Map("min" -> "0")),
      ValidationRule("size", RuleType.RowCount, Seq(),
        parameters = Map("min_rows" -> "1")),
      ValidationRule("fresh_recent", RuleType.Freshness, Seq("ts"),
        parameters = Map("max_age_seconds" -> "0", "reference_time" -> refIso)))
    val vcfg = ValidationConfig(tables = Seq(TableConfig("turns", rules = rules)))

    def best(runs: Int)(f: => Seq[ValidationResult]): (Double, Seq[ValidationResult]) =
      (1 to runs).map { _ =>
        val s = System.nanoTime(); val v = f; ((System.nanoTime() - s) / 1e9, v)
      }.minBy(_._1)

    val (fullSec, fullRes) = best(3)(
      new Validator(spark, vcfg).validateTable(SnapTable.read(spark, tbl), "turns").results)
    val (statsSec, statsRes) = best(3)(
      new Validator(spark, vcfg).validateSnapStatsFirst(tbl, "turns").results)

    fullRes.zip(statsRes).foreach { case (f, s) =>
      require(f.rule_name == s.rule_name &&
          f.failed_count == s.failed_count && f.total_count == s.total_count &&
          f.passed == s.passed,
        s"stats tier diverged on ${f.rule_name}: " +
          s"full=(${f.failed_count},${f.total_count},${f.passed}) " +
          s"stats=(${s.failed_count},${s.total_count},${s.passed})")
    }
    val scanned = statsRes.map(r =>
      s""""${r.rule_name}":${r.metadata.getOrElse("files_scanned", "-1")}""").mkString("{", ",", "}")

    println(
      f"""{"metric":"stats_tier","rows":${snap.totalRows},"files":${snap.files.size},""" +
      f""""full_sec":$fullSec%.3f,"stats_sec":$statsSec%.3f,""" +
      f""""speedup":${fullSec / statsSec}%.2f,"scanned_files_by_rule":$scanned%s,""" +
      f""""cpus":$cpus,"convs":$convs}""")
    spark.stop()
  }
}
