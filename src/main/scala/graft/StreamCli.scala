package graft

import graft.config.ConfigLoader
import graft.streaming.StreamValidator
import org.apache.spark.sql.SparkSession

/** Streaming CLI entry point — the class the streaming [[graft.deploy.JobSpec]]
  * targets: `spark-submit --class graft.StreamCli app.jar --config c.yaml
  * --stream-source <dir-or-table> --checkpoint-location <dir>
  * [--trigger-interval 60] [--table t] [--validated-sink dir]
  * [--metrics-dir dir] [--profile-dir dir] [--source-format parquet]
  * [--tags hourly,critical] [--await-seconds n] [--history-frames]`.
  *
  * Mirrors the parameter surface of the reference's generated streaming job
  * (`/root/reference/src/data_validator/databricks_utils.py:125-135`:
  * --config / --stream-source / --checkpoint-location / --trigger-interval).
  * The stream source is a file-stream directory (format via
  * --source-format, default parquet) or, when the path doesn't look like
  * one, a catalog table read with `spark.readStream.table`.
  */
object StreamCli {

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args.toList)
    def req(k: String): String = opts.getOrElse(k, sys.error(s"--$k is required"))
    val configPath = req("config")
    val source = req("stream-source")
    val checkpoint = req("checkpoint-location")
    val triggerSec = opts.get("trigger-interval").map(_.toLong).getOrElse(60L)

    // --tags a,b: the same scheduled-subset selection the batch CLI offers
    // (a lightweight always-on stream can carry the hourly tier while the
    // nightly batch runs everything, from ONE config)
    val loaded = ConfigLoader.fromYamlFile(configPath)
    val config = opts.get("tags").map(loaded.selectTags).getOrElse(loaded)
    val builder = SparkSession.builder().appName("graft-stream-validator")
      .config("spark.sql.adaptive.enabled", "true")
    (config.engine.connectionParams ++ config.engine.options).foreach {
      case (k, v) => builder.config(k, v)
    }
    if (sys.props.get("spark.master").isEmpty && sys.env.get("MASTER").isEmpty)
      builder.master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
    val spark = builder.getOrCreate()

    val tableName = opts.getOrElse("table",
      config.tables.headOption.map(_.name).getOrElse(sys.error("no table configured")))
    val format = opts.getOrElse("source-format", "parquet")
    val input =
      if (source.contains("/") || source.contains(java.io.File.separator)) {
        // file streams require an explicit schema: infer it once from the
        // files already present (the reference job also points at an
        // existing landing directory — databricks_utils.py:433)
        val schema = scala.util.Try(spark.read.format(format).load(source).schema)
          .getOrElse(sys.error(s"cannot infer stream schema from '$source' — " +
            "the directory must hold at least one readable file at launch"))
        spark.readStream.format(format).schema(schema).load(source)
      } else spark.readStream.table(source)

    val query = StreamValidator.start(
      spark, input, config, tableName,
      checkpointDir = checkpoint,
      validatedSink = opts.get("validated-sink"),
      triggerMs = triggerSec * 1000L,
      onResult = o => println(
        s"[stream] batch=${o.batchId} passed=${o.summary.passed_rules} failed=${o.summary.failed_rules}"),
      // --metrics-dir: per-batch rule results appended as the same
      // time-series the batch CLI writes (run_id = batch-<id>), so
      // MetricsSink.anomalies does batch-over-batch change detection on a
      // LIVE stream — "quality degraded at batch 17" — with plain SQL
      metricsSink = opts.get("metrics-dir"),
      // --profile-dir: per-batch mergeable profile states + a continuously
      // refreshed lifetime profile.json covering all data ever streamed,
      // without re-reading history (batchId-keyed states make replays
      // overwrite, not double-count)
      profileDir = opts.get("profile-dir"),
      // --history-frames (bare flag; needs a snap: --validated-sink):
      // cross-batch group-unit guarantees via the family-aware incremental
      // frames against the accumulated clean table
      historyFrames = opts.contains("history-frames"))

    // --await-seconds bounds the run (tests, smoke checks); absent = forever
    opts.get("await-seconds") match {
      case Some(s) => query.awaitTermination(s.toLong * 1000L); query.stop()
      case None    => query.awaitTermination()
    }
    spark.stop()
  }

  private def parseArgs(args: List[String], acc: Map[String, String] = Map.empty): Map[String, String] =
    args match {
      // bare flag (no value operand): cross-batch frames — same convention
      // as the batch CLI's --incremental
      case "--history-frames" :: rest =>
        parseArgs(rest, acc + ("history-frames" -> "true"))
      case flag :: value :: rest if flag.startsWith("--") =>
        parseArgs(rest, acc + (flag.stripPrefix("--") -> value))
      case Nil => acc
      case other => sys.error(s"unparsable args: $other")
    }
}
