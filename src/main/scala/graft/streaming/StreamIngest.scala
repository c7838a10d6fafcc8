package graft.streaming

import graft.operators.{CacheScope, Dedup}
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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
  * All ledger I/O goes through the Hadoop FileSystem resolved FROM the
  * index path, so the guarantee holds wherever the index lives (HDFS,
  * object stores, local disk) — java.nio would silently reduce an
  * `s3://` index back to at-least-once.
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

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, HPath) = {
    val p = new HPath(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  // zero-padded so filename order = batch order (the profile-state
  // writers' convention)
  private def pad(batchId: Long): String = f"$batchId%020d"

  private def intentPath(root: HPath, batchId: Long): HPath =
    new HPath(root, s"_ingest_ledger/${pad(batchId)}.intent")
  private def commitPath(root: HPath, batchId: Long): HPath =
    new HPath(root, s"_ingest_ledger/${pad(batchId)}.commit")

  /** Every data file currently in the index's bands/docs tables, as paths
    * relative to the index root. Underscore/dot names (Spark's _SUCCESS,
    * _temporary staging, hidden files) are not data and are excluded —
    * they must neither appear in intents nor be deleted by recovery. */
  private def dataFiles(fs: FileSystem, root: HPath): Set[String] = {
    val rootUri = fs.makeQualified(root).toUri
    Seq("bands", "docs").flatMap { sub =>
      val dir = new HPath(root, sub)
      if (!fs.exists(dir)) Nil
      else {
        val it = fs.listFiles(dir, true)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next()
          if (f.isFile) {
            val rel = rootUri.relativize(f.getPath.toUri).getPath
            if (!rel.split('/').exists(seg =>
              seg.startsWith("_") || seg.startsWith("."))) out += rel
          }
        }
        out
      }
    }.toSet
  }

  private def writeLines(fs: FileSystem, p: HPath, lines: Seq[String]): Unit = {
    val out = fs.create(p, true)
    try out.write(lines.mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readLines(fs: FileSystem, p: HPath): Seq[String] = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** If `batchId` left an intent without a commit (crash mid-append),
    * delete every index data file the crashed attempt added, restoring the
    * pre-append state so the re-run appends exactly once. */
  private def recoverCrashedAppend(fs: FileSystem, root: HPath, batchId: Long): Unit = {
    val intent = intentPath(root, batchId)
    if (fs.exists(intent) && !fs.exists(commitPath(root, batchId))) {
      val before = readLines(fs, intent).filter(_.nonEmpty).toSet
      (dataFiles(fs, root) -- before).foreach(rel =>
        fs.delete(new HPath(root, rel), false))
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
    val (fs, root) = fsOf(batch.sparkSession, indexDir)
    if (fs.exists(commitPath(root, batchId))) return None
    recoverCrashedAppend(fs, root, batchId)
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
        writeLines(fs, intentPath(root, batchId), dataFiles(fs, root).toSeq.sorted)
        Dedup.appendIndexFrame(fresh, indexDir)
        fs.create(commitPath(root, batchId), true).close()
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
