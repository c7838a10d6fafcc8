package graft.io

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions.{count, lit}

/** Small shared sink helpers. */
object Sinks {

  /** Append `df` to `path` as parquet and return THIS write's row count,
    * observed on the write itself — no second scan, and it counts this
    * run's rows rather than the cumulative sink a re-read would. Shared by
    * the quarantine sink and the streaming ingest pair sink. */
  def observedAppend(df: DataFrame, path: String): Long = {
    val obs = Observation()
    df.observe(obs, count(lit(1)).as("rows")).write.mode("append").parquet(path)
    obs.get("rows").asInstanceOf[Long]
  }

  /** Append-equivalent for foreachBatch sinks, but REPLAY-IDEMPOTENT: the
    * rows land in partition `ingest_batch=<batchId>` under dynamic
    * partition overwrite, so a replayed micro-batch REPLACES its own
    * partition (same deterministic content) instead of appending a
    * duplicate copy. Returns this write's observed row count (no second
    * scan). Partition-pruned reads by batch come free. */
  def observedBatchOverwrite(df: DataFrame, path: String, batchId: Long): Long = {
    val obs = Observation()
    df.withColumn("ingest_batch", lit(batchId))
      .observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch")
      .parquet(path)
    obs.get("rows").asInstanceOf[Long]
  }
}
