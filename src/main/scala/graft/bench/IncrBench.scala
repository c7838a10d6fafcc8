package graft.bench

import graft.{RuleType, TableConfig, ValidationConfig, ValidationRule}
import graft.engine.Validator
import graft.io.{SnapTable, TranscriptConfig, Transcripts}
import org.apache.spark.sql.functions._

/** Design-point probe for the incremental tier (SnapBench's sibling): ingest
  * the bench-scale transcripts table as a snap table, append a small
  * continuation batch (new turns for 1% of conversations — the nightly-growth
  * shape), then compare validating the WHOLE table vs
  * [[Validator.validateTableIncremental]] fed the snap `changes` delta — the
  * exact frames the CLI's `--incremental` path builds. The rule suite is the
  * flagship mix: three fused row rules, two group-unit rules (uniqueness +
  * sequence — these pay the affected-groups semi-join), one absolute
  * (row_count). Numbers are min-of-2 (both warm: one discarded warmup pass
  * runs first). Prints ONE JSON line. Knobs: SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BENCH_CONVS, SPARK_GRAFT_INCRBENCH_DIR. */
object IncrBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val convs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "1600000").toLong
    val dir = sys.env.getOrElse("SPARK_GRAFT_INCRBENCH_DIR", "/tmp/graft_incrbench")
    val spark = BenchSessions.local("graft-incrbench", cpus)
    val tbl = s"$dir/turns_snap"
    BenchSessions.wipe(spark, tbl)

    val cfg = TranscriptConfig(numConvs = convs, hotConvExtraTurns = convs / 10)
    val turns = Transcripts.turns(spark, cfg)
    SnapTable.create(spark, tbl, turns)

    // the nightly growth batch: 4 continuation turns for 1% of conversations,
    // indices picking up where the generator's per-conv length left off (same
    // hash formula), so the semi-joined whole conversations stay dense and
    // the sequence rule measures the real revalidation work, not a gap storm
    val deltaConvs = math.max(convs / 100, 1L)
    val len = (lit(cfg.minTurns) +
      pmod(xxhash64(lit(cfg.seed), lit("len"), col("cid")), lit(cfg.turnSpread.toLong))).cast("int")
    val delta = spark.range(1L, deltaConvs + 1L).toDF("cid")
      .select(col("cid"), len.as("len"),
        explode(sequence(lit(0), lit(3))).as("k"))
      .select(
        format_string("conv-%08x", col("cid")).as("conv_id"),
        (col("len") + col("k")).as("turn_idx"),
        when((col("len") + col("k")) % 2 === 0, "user").otherwise("assistant").as("role"),
        lit("appended continuation turn").as("text"),
        lit(null).cast("string").as("tool"),
        timestamp_seconds(lit(1700000000L) + col("cid") * 300L +
          (col("len") + col("k")).cast("long") * 7L).as("ts"))
    val v1 = SnapTable.snapshot(spark, tbl).version
    SnapTable.append(spark, tbl, delta)
    val v2 = SnapTable.snapshot(spark, tbl).version

    val rules = Seq(
      ValidationRule("text_complete", RuleType.Completeness, Seq("text"), threshold = Some(0.9)),
      ValidationRule("conv_pattern", RuleType.Pattern, Seq("conv_id"),
        expression = Some("^conv-[0-9a-f]{8}$"), threshold = Some(0.9)),
      ValidationRule("turn_range", RuleType.Range, Seq("turn_idx"),
        parameters = Map("min" -> "0", "max" -> "100000"), threshold = Some(0.9)),
      ValidationRule("turn_key", RuleType.Uniqueness, Seq("conv_id", "turn_idx"),
        threshold = Some(0.9)),
      ValidationRule("turn_seq", RuleType.Sequence, Seq("conv_id"),
        parameters = Map("index" -> "turn_idx"), threshold = Some(0.8)),
      ValidationRule("size", RuleType.RowCount, Seq(),
        parameters = Map("min_rows" -> "1000")))
    val validator = new Validator(spark,
      ValidationConfig(tables = Seq(TableConfig("turns", rules = rules))))

    val full = SnapTable.read(spark, tbl)
    val changed = SnapTable.changes(spark, tbl, v1, Some(v2))
    val rowsTotal = full.count()
    val rowsDelta = changed.count()

    def best(runs: Int)(f: => graft.ValidationSummary): (Double, Long) = {
      f // discarded warmup (codegen compile; both paths get one)
      (1 to runs).map { _ =>
        val s = System.nanoTime(); val v = f
        ((System.nanoTime() - s) / 1e9, v.failed_rules.toLong)
      }.minBy(_._1)
    }
    val (fullSec, fullFailed) = best(2)(validator.validateTable(full, "turns"))
    val (incrSec, incrFailed) = best(2)(
      validator.validateTableIncremental(full, changed, "turns"))

    // the composed 100 TB shape: same table CLUSTERED by conversation key +
    // the readTouchedBy hook — the group semi-joins' table side reads only
    // the files whose conv_id range the delta touches (the delta extends
    // the LOW 1% of conversations, so a 64-file clustered layout keeps ~1)
    val ctbl = s"$dir/turns_snap_clustered"
    BenchSessions.wipe(spark, ctbl)
    SnapTable.create(spark, ctbl, SnapTable.clustered(turns, "conv_id", files = 64))
    SnapTable.append(spark, ctbl, delta)
    val cChanged = SnapTable.changes(spark, ctbl, 1L, Some(2L))
    val cFull = SnapTable.read(spark, ctbl)
    val hook = (keys: Seq[String]) =>
      SnapTable.readTouchedBy(spark, ctbl, keys.head, cChanged)
    val (prunedSec, prunedFailed) = best(2)(validator.validateTableIncremental(
      cFull, cChanged, "turns", tableFrameForKeys = Some(hook)))
    require(prunedFailed == incrFailed,
      s"pruned-frame verdicts diverged: $prunedFailed vs $incrFailed failed rules")
    val cSnap = SnapTable.snapshot(spark, ctbl)
    val keyLo = f"conv-${1L}%08x"; val keyHi = f"conv-${deltaConvs}%08x"
    val (kept, _) = SnapTable.planPrune(spark, ctbl, "conv_id", Some(keyLo), Some(keyHi))

    println(
      f"""{"metric":"incr_validate","rows_total":$rowsTotal,"rows_delta":$rowsDelta,""" +
      f""""full_sec":$fullSec%.2f,"incr_sec":$incrSec%.2f,""" +
      f""""speedup":${fullSec / incrSec}%.2f,""" +
      f""""incr_pruned_sec":$prunedSec%.2f,"pruned_speedup":${fullSec / prunedSec}%.2f,""" +
      f""""files_total":${cSnap.files.size},"files_touched":${kept.size},""" +
      f""""full_failed_rules":$fullFailed,"incr_failed_rules":$incrFailed,""" +
      f""""cpus":$cpus,"convs":$convs}""")
    spark.stop()
  }
}
