package graft.streaming

import graft._
import graft.engine.{RulePlanner, Validator}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured-Streaming validation: micro-batch reuse of the batch path via
  * `foreachBatch`, mirroring the reference's generated streaming job
  * (`/root/reference/src/data_validator/databricks_utils.py:425-450`:
  * readStream → foreachBatch(validate + filter + append) →
  * checkpointLocation + processing-time trigger).
  *
  * Each micro-batch runs the SAME fused batch plan (one aggregate job per
  * batch), clean rows append to the sink, and per-batch summaries stream to
  * `onResult` — so batch and streaming validation can never diverge.
  */
object StreamValidator {

  final case class BatchOutcome(batchId: Long, summary: ValidationSummary)

  /** Wire a streaming DataFrame through per-batch validation.
    *
    * @param input          streaming DataFrame (`spark.readStream...`)
    * @param validatedSink  path for clean (filter-passing) rows; None = skip.
    *                       A `snap:DIR` value appends to a [[graft.io.SnapTable]]
    *                       with the batch id as idempotence tag — EXACTLY-ONCE
    *                       under foreachBatch replays, and the validated table
    *                       becomes time-travelable/incrementally readable
    * @param checkpointDir  Structured Streaming checkpoint location
    * @param triggerMs      processing-time trigger (reference default 60 s)
    * @param onResult       callback per micro-batch (metrics/alerting hook)
    * @param tableResolver  reference-table lookup for referential/drift rules
    *                       (passed through to each per-batch Validator —
    *                       without it those rules fail "unknown ref_table")
    * @param metricsSink    path for the per-batch rule-result time-series
    *                       ([[graft.io.MetricsSink]], run_id = "batch-<id>")
    *                       — observability without a custom onResult
    * @param profileDir     incremental-profiling sink: each micro-batch is
    *                       profiled in one pass and its mergeable sketch
    *                       state persisted under `DIR/<table>/state_batch-
    *                       <id>.bin`; `DIR/<table>/profile.json` is
    *                       refreshed with the LIFETIME profile (merge of
    *                       every batch state — all data ever streamed,
    *                       never re-read). State files are keyed by
    *                       batchId, so a replayed batch OVERWRITES its own
    *                       state instead of double-counting: the lifetime
    *                       profile is effectively-once even though
    *                       foreachBatch is at-least-once
    * @param historyFrames  cross-batch group-unit guarantees (requires a
    *                       `snap:` validatedSink — the accumulated clean
    *                       table IS the history): each micro-batch is
    *                       validated with the family-aware incremental
    *                       frames ([[graft.engine.Validator
    *                       .validateTableIncremental]] over accumulated ∪
    *                       batch) — row rules exact on the batch, group-unit
    *                       rules on the affected groups across ALL batches
    *                       (a turn extending a conversation committed three
    *                       batches ago revalidates that whole conversation;
    *                       a key duplicating any historical clean row is
    *                       caught), absolute families on the whole
    *                       accumulated table. The default per-batch path
    *                       holds group-unit guarantees only WITHIN a batch.
    *                       A REPLAYED batch (id ≤ the sink's committed
    *                       high-water mark) runs the plain per-batch path:
    *                       its rows are already in the table and the union
    *                       would double-count them
    */
  def start(
      spark: SparkSession,
      input: DataFrame,
      config: ValidationConfig,
      tableName: String,
      checkpointDir: String,
      validatedSink: Option[String] = None,
      triggerMs: Long = 60000L,
      onResult: BatchOutcome => Unit = _ => (),
      tableResolver: String => Option[DataFrame] = _ => None,
      metricsSink: Option[String] = None,
      profileDir: Option[String] = None,
      historyFrames: Boolean = false): StreamingQuery = {

    val rules = config.enabledRules(tableName)
    val snapSink = validatedSink.filter(_.startsWith("snap:")).map(_.stripPrefix("snap:"))
    require(!historyFrames || snapSink.isDefined,
      "historyFrames requires a snap: validatedSink — the accumulated clean table is the history")

    // one-time upgrade hygiene, BEFORE the stream starts (not per batch):
    // migrate any legacy unpadded state names so filename order equals
    // batch recency across the whole profile directory
    profileDir.foreach(dir => migrateLegacyStates(s"$dir/$tableName"))

    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val validator = new Validator(spark, config, tableResolver)
        val summary = snapSink match {
          case Some(dir) if historyFrames &&
              graft.io.SnapTable.versions(spark, dir).nonEmpty &&
              !graft.io.SnapTable.snapshot(spark, dir).batchSeq.exists(batchId <= _) =>
            // accumulated ∪ batch: the batch's rows are NOT yet committed
            // (clean rows append below), so the union is the current truth
            // the group-unit semi-joins must see. The accumulated side is
            // file-pruned to the batch's key range (readTouchedBy) — on a
            // key-clustered layout each micro-batch reads only the files
            // holding the conversations it extends
            validator.validateTableIncremental(
              graft.io.SnapTable.read(spark, dir).unionByName(batch), batch, tableName,
              tableFrameForKeys = Some(keys =>
                graft.io.SnapTable.readTouchedBy(spark, dir, keys.head, batch)
                  .unionByName(batch)))
          case _ => validator.executeRules(batch, rules, tableName)
        }
        onResult(BatchOutcome(batchId, summary))
        metricsSink.foreach(path =>
          graft.io.MetricsSink.appendSummary(spark, summary, path, s"batch-$batchId"))
        profileDir.foreach { dir =>
          // zero-padded batch id: state FILENAMES sort by batch recency, so
          // the profile lineage anchor's filename tie-break
          // (Profiler.lifetimeState) holds for streaming dirs too —
          // "batch-10" would sort before "batch-2" unpadded. Same batch →
          // same name, so the replay-overwrite property is unchanged.
          val stateRunId = f"batch-$batchId%012d"
          val res = graft.engine.Profiler.profileRun(
            batch, s"$dir/$tableName", stateRunId)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$dir/$tableName/profile.json"),
            graft.Json.writeProfile(tableName, s"batch-$batchId", res))
        }
        validatedSink.foreach { sink =>
          val clean = RulePlanner.applyFilters(batch, rules)
          // snap: sinks get EXACTLY-ONCE delivery — the batch-tagged commit
          // makes a foreachBatch replay a no-op (plain parquet append stays
          // at-least-once: Spark's own documented foreachBatch contract)
          if (sink.startsWith("snap:"))
            graft.io.SnapTable.appendBatch(spark, sink.stripPrefix("snap:"),
              clean, batchSeq = batchId)
          else clean.write.mode("append").parquet(sink)
        }
        ()
      }
      .start()
  }

  /** Rename legacy UNPADDED batch-state files (`state_batch-7.bin`) to the
    * zero-padded scheme so filename order equals batch recency across the
    * whole profile directory — the tie-break `Profiler.lifetimeState`'s
    * lineage anchor relies on when mtimes were flattened by a copy. A
    * legacy file whose padded name already exists is the OLDER duplicate
    * of a batch replayed across the upgrade boundary: deleted, never
    * merged twice. */
  private[graft] def migrateLegacyStates(tableDir: String): Unit = {
    val p = java.nio.file.Paths.get(tableDir)
    if (!java.nio.file.Files.isDirectory(p)) return
    val legacy = "state_batch-(\\d{1,11})\\.bin".r
    val s = java.nio.file.Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq.foreach { f =>
        f.getFileName.toString match {
          case legacy(digits) =>
            val target = f.resolveSibling(f"state_batch-${digits.toLong}%012d.bin")
            if (java.nio.file.Files.exists(target)) java.nio.file.Files.delete(f)
            else java.nio.file.Files.move(f, target)
          case _ => ()
        }
      }
    } finally s.close()
  }
}
