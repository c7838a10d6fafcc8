package graft.bench

import graft.io.{SnapTable, TranscriptConfig, Transcripts}
import org.apache.spark.sql.functions._

/** Design-point probe for manifest-level pruning at the bench scale (the
  * keyed-diff measurement's sibling): write the 28M-turn transcripts table
  * as a time-clustered snap table, then compare "validate the most recent
  * 1/16 of event time" as a FULL scan + filter vs a PRUNED readWhere. The
  * bound is derived from the manifest's own footer stats (epoch micros),
  * exercising the real path end to end. Prints ONE JSON line; numbers are
  * min-of-3. Knobs: SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_CONVS,
  * SPARK_GRAFT_SNAPBENCH_DIR, SPARK_GRAFT_SNAP_FILES. */
object SnapBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val convs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "1600000").toLong
    val dir = sys.env.getOrElse("SPARK_GRAFT_SNAPBENCH_DIR", "/tmp/graft_snapbench")
    val files = sys.env.getOrElse("SPARK_GRAFT_SNAP_FILES", "64").toInt
    val spark = BenchSessions.local("graft-snapbench", cpus)
    val tbl = s"$dir/turns_snap"
    BenchSessions.wipe(spark, tbl)

    val cfg = TranscriptConfig(numConvs = convs, hotConvExtraTurns = convs / 10)
    val turns = Transcripts.turns(spark, cfg)
    val t0 = System.nanoTime()
    val snap = SnapTable.create(spark, tbl, SnapTable.clustered(turns, "ts", files))
    val ingestSec = (System.nanoTime() - t0) / 1e9

    // the recent-time bound comes from the manifest's OWN stats — micros
    val tsStats = snap.files.flatMap(_.stats.get("ts")).filter(_.hasMinMax)
    val tsMin = tsStats.map(_.min.toLong).min
    val tsMax = tsStats.map(_.max.toLong).max
    val lo = tsMax - (tsMax - tsMin) / 16

    // the validation-shaped aggregate both paths pay: count + null-rate
    def agg(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum(when(col("text").isNull, 1L).otherwise(0L))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def best(runs: Int)(f: => (Long, Long)): (Double, (Long, Long)) =
      (1 to runs).map { _ =>
        val s = System.nanoTime(); val v = f; ((System.nanoTime() - s) / 1e9, v)
      }.minBy(_._1)

    val (keep, pruned) = SnapTable.planPrune(spark, tbl, "ts", Some(lo.toString), None)
    // fair comparator: the best a user can do WITHOUT the manifest — a
    // pushdown-eligible timestamp predicate (parquet row-group stats prune
    // inside every file); the manifest's edge is skipping whole files
    // before the scan plans at all
    val (fullSec, fullV) = best(3)(agg(
      SnapTable.read(spark, tbl).filter(col("ts") >= timestamp_micros(lit(lo)))))
    val (prunedSec, prunedV) = best(3)(agg(
      SnapTable.readWhere(spark, tbl, "ts", Some(lo.toString), None)))
    require(fullV == prunedV, s"pruned read diverged: $fullV vs $prunedV")

    val bytesTotal = snap.files.map(_.sizeBytes).sum
    val bytesKept = keep.map(_.sizeBytes).sum
    println(
      f"""{"metric":"snap_prune","rows_total":${snap.totalRows},"rows_slice":${fullV._1},""" +
      f""""files_total":${snap.files.size},"files_kept":${keep.size},"files_pruned":${pruned.size},""" +
      f""""bytes_total":$bytesTotal,"bytes_kept":$bytesKept,""" +
      f""""ingest_sec":$ingestSec%.2f,"full_scan_sec":$fullSec%.3f,"pruned_sec":$prunedSec%.3f,""" +
      f""""speedup":${fullSec / prunedSec}%.2f,"cpus":$cpus,"convs":$convs}""")
    spark.stop()
  }
}
