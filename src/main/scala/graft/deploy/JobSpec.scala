package graft.deploy

/** spark-submit-oriented job-spec emitter — the portable equivalent of the
  * reference's Databricks job generator
  * (`/root/reference/src/data_validator/databricks_utils.py:49-141`). The
  * reference emits Databricks Jobs-API payloads; this emits the same KNOBS
  * (cluster size, spark confs, timeout, retries, schedule, streaming
  * trigger/checkpoint) as a vendor-neutral JSON spec any scheduler
  * (Airflow, cron, a k8s operator) can consume, plus a rendered
  * spark-submit argv for direct launches. Defaults mirror the reference's:
  * batch = 2 workers / AQE + partition coalescing / 3600 s timeout /
  * 2 retries, retry-on-timeout; streaming = 3 workers / temp-checkpoint
  * force-delete / indefinite timeout / 5 retries / 60 s trigger
  * (`databricks_utils.py:49-62,81-83,110-119,130,141-143`).
  */
final case class ClusterSpec(
    num_executors: Int,
    executor_cores: Int,
    executor_memory: String,
    spark_conf: Map[String, String])

final case class JobSpec(
    name: String,
    main_class: String,
    arguments: Seq[String],
    cluster: ClusterSpec,
    timeout_seconds: Long,
    max_retries: Int,
    retry_on_timeout: Boolean,
    schedule_cron: Option[String],
    /** DLT-style expectations carried with the job: rule name → Spark-SQL
      * keep-predicate ([[graft.engine.RulePlanner.dltExpectations]]) — a
      * DLT migrator reads these into `@dlt.expect_or_drop`; any other
      * scheduler can ignore them. Sorted map for deterministic JSON. */
    dlt_expectations: Map[String, String] = Map.empty)

object JobSpec {

  /** Reference batch cluster (`databricks_utils.py:49-62`), sized in
    * vendor-neutral units (i3.xlarge ≈ 4 cores / 30 GB). */
  val defaultBatchCluster: ClusterSpec = ClusterSpec(
    num_executors = 2,
    executor_cores = 4,
    executor_memory = "24g",
    spark_conf = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true"))

  /** Reference streaming cluster (`databricks_utils.py:110-119`). */
  val defaultStreamingCluster: ClusterSpec = ClusterSpec(
    num_executors = 3,
    executor_cores = 4,
    executor_memory = "24g",
    spark_conf = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.streaming.forceDeleteTempCheckpointLocation" -> "true"))

  /** Batch validation job (reference `create_validation_job`,
    * `databricks_utils.py:31-93`): timeout 3600 s, 2 retries, retry on
    * timeout, optional cron schedule. Entry point is the real [[graft.Cli]]. */
  def batch(
      jobName: String,
      configPath: String,
      sourcesPath: Option[String] = None,
      outputPath: Option[String] = None,
      cluster: ClusterSpec = defaultBatchCluster,
      scheduleCron: Option[String] = None,
      dltExpectations: Map[String, String] = Map.empty): JobSpec =
    JobSpec(
      name = jobName,
      main_class = "graft.Cli",
      arguments = Seq("--config", configPath) ++
        sourcesPath.toSeq.flatMap(p => Seq("--sources", p)) ++
        outputPath.toSeq.flatMap(p => Seq("--output", p)),
      cluster = cluster,
      timeout_seconds = 3600L,
      max_retries = 2,
      retry_on_timeout = true,
      schedule_cron = scheduleCron,
      dlt_expectations = scala.collection.immutable.SortedMap.empty[String, String] ++
        dltExpectations)

  /** Streaming validation job (reference `create_streaming_validation_job`,
    * `databricks_utils.py:95-143`): indefinite timeout (0), 5 retries,
    * checkpoint + processing-time trigger carried as arguments. Entry point
    * is the real [[graft.StreamCli]]. */
  def streaming(
      jobName: String,
      configPath: String,
      sourceTable: String,
      checkpointLocation: String,
      triggerIntervalSec: Long = 60L,
      validatedSink: Option[String] = None,
      cluster: ClusterSpec = defaultStreamingCluster): JobSpec =
    JobSpec(
      name = jobName,
      main_class = "graft.StreamCli",
      arguments = Seq(
        "--config", configPath,
        "--stream-source", sourceTable,
        "--checkpoint-location", checkpointLocation,
        "--trigger-interval", triggerIntervalSec.toString) ++
        validatedSink.toSeq.flatMap(p => Seq("--validated-sink", p)),
      cluster = cluster,
      timeout_seconds = 0L, // streaming jobs run indefinitely
      max_retries = 5,
      retry_on_timeout = false,
      schedule_cron = None)

  /** The spec rendered as spark-submit argv (append the application jar's
    * own arguments are already in `spec.arguments`). */
  def sparkSubmitCommand(spec: JobSpec, jarPath: String): Seq[String] =
    Seq("spark-submit",
      "--class", spec.main_class,
      "--name", spec.name,
      "--num-executors", spec.cluster.num_executors.toString,
      "--executor-cores", spec.cluster.executor_cores.toString,
      "--executor-memory", spec.cluster.executor_memory) ++
      spec.cluster.spark_conf.toSeq.sortBy(_._1).flatMap { case (k, v) =>
        Seq("--conf", s"$k=$v")
      } ++
      Seq(jarPath) ++ spec.arguments

  def toJson(spec: JobSpec): String = {
    import org.json4s.DefaultFormats
    import org.json4s.jackson.Serialization
    implicit val fmt: DefaultFormats = DefaultFormats
    Serialization.writePretty(spec)
  }

  def fromJson(json: String): JobSpec = {
    import org.json4s.DefaultFormats
    import org.json4s.jackson.Serialization
    implicit val fmt: DefaultFormats = DefaultFormats
    Serialization.read[JobSpec](json)
  }
}
