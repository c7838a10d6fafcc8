package graft.io

import graft.{ValidationSummary, PartitionVerdict}
import org.apache.spark.sql.{SaveMode, SparkSession}

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
