package graft.io

import graft.{ValidationSummary, PartitionVerdict}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Append-only metrics TABLE of rule results over time — the real sink
  * behind the reference's print-only DQX/DLT observability hooks
  * (/root/reference: `validator.py:264-274` declares quarantine/metrics
  * hooks that only log). Each validation run appends one small slice
  * per table, date-partitioned, so success rates / failure counts trend
  * over runs with ordinary SQL on the sink:
  *
  * {{{
  *   SELECT rule_name, run_date, avg(success_rate)
  *   FROM parquet.`/sinks/metrics` GROUP BY 1, 2 ORDER BY 2
  * }}}
  *
  * The write is driver-side tiny (one row per rule), partitioned by
  * `run_date` so downstream trend queries prune to their window. */
object MetricsSink {

  final case class MetricRow(
      run_id: String,
      run_date: String, // yyyy-MM-dd partition key
      run_ts: java.sql.Timestamp,
      table_name: String,
      rule_name: String,
      rule_type: String,
      passed: Boolean,
      failed_count: Long,
      total_count: Long,
      success_rate: Double,
      severity: String,
      execution_time_ms: Double)

  final case class PartitionMetricRow(
      run_id: String,
      run_date: String,
      table_name: String,
      partition: String,
      rule_name: String,
      passed: Boolean,
      failed_count: Long,
      total_count: Long,
      success_rate: Double)

  /** Append one run's global rule results. `at` defaults to now; pass it
    * explicitly for reproducible tests. */
  def appendSummary(
      spark: SparkSession, summary: ValidationSummary, path: String,
      runId: String, at: java.time.Instant = java.time.Instant.now()): Unit = {
    import spark.implicits._
    val date = at.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    val ts = java.sql.Timestamp.from(at)
    val rows = summary.results.map { r =>
      MetricRow(runId, date, ts, summary.table_name, r.rule_name, r.rule_type,
        r.passed, r.failed_count, r.total_count, r.success_rate, r.severity,
        r.execution_time_ms)
    }
    spark.createDataset(rows).toDF()
      .write.mode(SaveMode.Append).partitionBy("run_date").parquet(path)
  }

  /** Anomaly detection over the metrics time series (the Deequ
    * anomaly-detection idea re-expressed over this sink): for every run of
    * every (table, rule), compare its success_rate against the trailing
    * `window` runs' mean/std and flag deviations exceeding
    * max(maxZ · std, minAbsDelta). The std term adapts the gate to each
    * rule's own historical noise; the absolute floor keeps a rule whose
    * history is perfectly flat (std 0 — the common case for a healthy
    * rule) from alarming on an infinitesimal dip, and is the whole gate
    * until 2+ history points exist.
    *
    * A fixed threshold answers "is quality below X"; this answers "did
    * quality CHANGE" — the alert that catches a upstream pipeline break
    * the day it happens even when the rate stays above threshold.
    *
    * One scan of the sink, window partitioned by (table, rule) ordered by
    * (run_ts, run_id) — no unpartitioned window at any history size; the
    * date-partitioned layout prunes when callers pre-filter run_date.
    * Returns every run's verdict (callers filter `flagged`, or take the
    * latest run_id); `n_history` counts the trailing runs actually seen. */
  def anomalies(
      spark: SparkSession, path: String,
      window: Int = 7, maxZ: Double = 3.0,
      minAbsDelta: Double = 0.05): DataFrame = {
    require(window >= 2, s"anomaly window needs >= 2 trailing runs, got $window")
    val w = Window.partitionBy("table_name", "rule_name")
      .orderBy(col("run_ts"), col("run_id"))
      .rowsBetween(-window, -1)
    val withStats = spark.read.parquet(path)
      .select("run_id", "run_date", "run_ts", "table_name", "rule_name",
        "rule_type", "success_rate")
      .withColumn("trailing_mean", avg("success_rate").over(w))
      .withColumn("trailing_std", coalesce(stddev_samp(col("success_rate")).over(w), lit(0.0)))
      .withColumn("n_history", count(lit(1)).over(w))
    withStats
      .withColumn("deviation", abs(col("success_rate") - col("trailing_mean")))
      .withColumn("flagged",
        col("n_history") >= 1 &&
          col("deviation") > greatest(col("trailing_std") * lit(maxZ), lit(minAbsDelta)))
  }

  /** [[anomalies]] restricted to each (table, rule)'s LATEST run — the
    * "alert me about the run that just finished" shape. */
  def latestAnomalies(
      spark: SparkSession, path: String,
      window: Int = 7, maxZ: Double = 3.0,
      minAbsDelta: Double = 0.05): DataFrame = {
    val all = anomalies(spark, path, window, maxZ, minAbsDelta)
    val latest = Window.partitionBy("table_name", "rule_name")
      .orderBy(col("run_ts").desc, col("run_id").desc)
    all.withColumn("__rn", row_number().over(latest))
      .filter(col("__rn") === 1 && col("flagged"))
      .drop("__rn")
  }

  /** [[anomalies]] restricted to ONE run id — the CLI `--anomaly-gate`
    * shape: after a run appends its slice, flag exactly THAT run's
    * deviations. Filtering by run_id (not "latest") means a stale flagged
    * run of some table this run never touched cannot re-fire the gate
    * forever. */
  def runAnomalies(
      spark: SparkSession, path: String, runId: String,
      window: Int = 7, maxZ: Double = 3.0,
      minAbsDelta: Double = 0.05): DataFrame =
    anomalies(spark, path, window, maxZ, minAbsDelta)
      .filter(col("run_id") === runId && col("flagged"))

  /** Append per-partition verdicts alongside (separate sink path — the
    * row count is O(partitions × rules), still bounded by the verdict
    * machinery's bucket guard). */
  def appendPartitionVerdicts(
      spark: SparkSession, tableName: String, verdicts: Seq[PartitionVerdict],
      path: String, runId: String,
      at: java.time.Instant = java.time.Instant.now()): Unit = {
    import spark.implicits._
    if (verdicts.isEmpty) return
    val date = at.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    val rows = verdicts.map { v =>
      PartitionMetricRow(runId, date, tableName, v.partition, v.rule_name,
        v.passed, v.failed_count, v.total_count, v.success_rate)
    }
    spark.createDataset(rows).toDF()
      .write.mode(SaveMode.Append).partitionBy("run_date").parquet(path)
  }
}
