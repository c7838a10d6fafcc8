package graft.streaming

import graft.operators.{CacheScope, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Streaming near-duplicate INGEST: each micro-batch of documents is
  * checked for near-dups BOTH against the ON-DISK signature index
  * ([[graft.operators.Dedup.writeSignatureIndex]] layout) and within
  * itself (two near-dups arriving in the same trigger are in neither the
  * index nor each other's view otherwise), then absorbed into the index —
  * so every batch sees every previously ingested document. This is the
  * production ingest loop for a continuously growing corpus, expressed as
  * a Structured Streaming sink.
  *
  * `foreachBatch` is the right tool here (not a streaming-native join):
  * the per-batch work is a BATCH join against at-rest bucketed tables,
  * and the detect-THEN-absorb ordering inside one batch is a side-effect
  * sequence no declarative streaming join expresses. The batch index is
  * built ONCE per trigger (cached under the batch scope) and explicitly
  * feeds all three steps — detect-vs-index, detect-within-batch, absorb.
  *
  * Delivery semantics: foreachBatch itself is at-least-once (a crash
  * between the side effects and the streaming checkpoint commit replays
  * the batch), but BOTH side effects here are replay-idempotent, making
  * the ingest effectively exactly-once:
  *
  *  - the PAIRS SINK writes each batch's rows into its own
  *    `ingest_batch=<id>` partition with dynamic partition overwrite — a
  *    replay REPLACES the partition with the same deterministic content,
  *    never appends a duplicate copy;
  *  - the INDEX APPEND runs under a two-phase ledger in
  *    `<indexDir>/_ingest_ledger`: an INTENT file (the index's data-file
  *    listing BEFORE the append) is written first, a COMMIT marker after.
  *    A replay of a committed batch skips every side effect; a replay that
  *    finds an intent without a commit first deletes every index data file
  *    NOT in the intent listing — exactly the crashed attempt's
  *    partial/duplicate files, because the index has a single writer per
  *    checkpoint (the streaming engine's own serial-batch guarantee) —
  *    then re-runs the batch cleanly. Signatures are never double-appended
  *    whatever the crash point.
  *
  * The ledger assumes the index directory has ONE writer (this query);
  * concurrent batch-side appends to the same index during streaming would
  * be reclassified as crash debris. That is the same single-writer contract
  * the streaming checkpoint itself imposes.
  */
object StreamIngest {

  /** `docs` counts the batch's documents with usable shingle content (an
    * empty/whitespace-only text has no signature and never enters the
    * index — it is not countable near-dup material). */
  final case class IngestBatch(batchId: Long, docs: Long, nearDupPairs: Long)

  // ---------------------------------------------------------- replay ledger

  private def ledgerDir(indexDir: String): Path = {
    val p = Paths.get(indexDir, "_ingest_ledger")
    Files.createDirectories(p)
    p
  }

  // zero-padded so filename order = batch order (the profile-state
  // writers' convention)
  private def pad(batchId: Long): String = f"$batchId%020d"

  private def intentPath(indexDir: String, batchId: Long): Path =
    ledgerDir(indexDir).resolve(s"${pad(batchId)}.intent")
  private def commitPath(indexDir: String, batchId: Long): Path =
    ledgerDir(indexDir).resolve(s"${pad(batchId)}.commit")

  private[streaming] def isCommitted(indexDir: String, batchId: Long): Boolean =
    Files.exists(commitPath(indexDir, batchId))

  /** Every data file currently in the index's bands/docs tables, as paths
    * relative to `indexDir`. Underscore/dot names (Spark's _SUCCESS,
    * _temporary staging, hidden files) are not data and are excluded —
    * they must neither appear in intents nor be deleted by recovery. */
  private def dataFiles(indexDir: String): Set[String] = {
    val root = Paths.get(indexDir)
    Seq("bands", "docs").flatMap { sub =>
      val dir = root.resolve(sub)
      if (!Files.isDirectory(dir)) Nil
      else {
        val s = Files.walk(dir)
        try s.iterator().asScala
          .filter(p => Files.isRegularFile(p))
          .map(p => root.relativize(p).toString)
          .filterNot(rel => rel.split('/').exists(seg =>
            seg.startsWith("_") || seg.startsWith(".")))
          .toList
        finally s.close()
      }
    }.toSet
  }

  /** If `batchId` left an intent without a commit (crash mid-append),
    * delete every index data file the crashed attempt added, restoring the
    * pre-append state so the re-run appends exactly once. */
  private def recoverCrashedAppend(indexDir: String, batchId: Long): Unit = {
    val intent = intentPath(indexDir, batchId)
    if (Files.exists(intent) && !isCommitted(indexDir, batchId)) {
      val before = Files.readAllLines(intent).asScala.toSet
      val root = Paths.get(indexDir)
      (dataFiles(indexDir) -- before).foreach(rel =>
        Files.deleteIfExists(root.resolve(rel)))
    }
  }

  /** One micro-batch of the ingest loop: detect (vs index, then within the
    * batch), emit pairs, absorb into the index — all replay-idempotent (see
    * the class doc). Returns None when the batch was already fully
    * committed by a previous attempt (replay after commit: every side
    * effect, including the metrics callback, already happened) or when the
    * batch carries no signable documents. Public so specs and batch
    * backfills can drive the exact foreachBatch body. */
  def ingestBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      indexDir: String,
      shingleSize: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      minJaccard: Double = 0.5,
      charGrams: Boolean = false,
      pairsSink: Option[String] = None): Option[IngestBatch] = {
    if (isCommitted(indexDir, batchId)) return None
    recoverCrashedAppend(indexDir, batchId)
    CacheScope.cached {
      // the batch's shingles+signatures are built ONCE and explicitly
      // feed detect-vs-index, detect-within-batch, AND absorb; the doc
      // count rides the same materialization (no extra source scan)
      val fresh = CacheScope.ambient.cache(
        Dedup.buildSignatureIndex(batch, idCol, textCol,
          shingleSize, numHashes, bands, charGrams))
      val n = fresh.count()
      if (n == 0) None
      else {
        val vsIndex = Dedup.storedIndexPairs(fresh, indexDir, minJaccard)
        val within = Dedup.pairsWithinIndex(fresh, minJaccard)
          .select(col("id_a").as("id_new"), col("id_b").as("id_index"), col("jaccard"))
        val pairs = vsIndex.unionByName(within)
        val pairCount = pairsSink match {
          case Some(sink) => graft.io.Sinks.observedBatchOverwrite(pairs, sink, batchId)
          case None       => pairs.count()
        }
        Files.write(intentPath(indexDir, batchId),
          dataFiles(indexDir).toSeq.sorted.asJava)
        Dedup.appendIndexFrame(fresh, indexDir)
        Files.createFile(commitPath(indexDir, batchId))
        Some(IngestBatch(batchId, n, pairCount))
      }
    }
  }

  /** Wire a streaming documents DataFrame through detect-then-absorb.
    *
    * @param input       streaming DataFrame with `idCol` and `textCol`
    * @param indexDir    an index created by [[Dedup.writeSignatureIndex]]
    *                    (seed it with the existing corpus — possibly empty)
    * @param charGrams   must match what the index was built with (mixing
    *                    word- and char-shingle signatures makes them
    *                    silently incomparable)
    * @param pairsSink   parquet path holding each batch's near-dup pairs
    *                    (id_new, id_index, jaccard) under an
    *                    `ingest_batch=<id>` partition — intra-batch pairs
    *                    appear as (smaller id, larger id); None = counts via
    *                    onBatch only
    * @param onBatch     per-batch callback (counts for metrics/alerting);
    *                    fires at most once per batch id — a replay of an
    *                    already-committed batch is silent
    */
  def start(
      spark: SparkSession,
      input: DataFrame,
      idCol: String,
      textCol: String,
      indexDir: String,
      checkpointDir: String,
      shingleSize: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      minJaccard: Double = 0.5,
      charGrams: Boolean = false,
      pairsSink: Option[String] = None,
      triggerMs: Long = 60000L,
      onBatch: IngestBatch => Unit = _ => ()): StreamingQuery = {

    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, idCol, textCol, indexDir,
          shingleSize, numHashes, bands, minJaccard, charGrams, pairsSink)
          .foreach(onBatch)
        ()
      }
      .start()
  }
}
