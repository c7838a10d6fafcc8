package graft.streaming

import graft.operators.{CacheScope, Dedup}
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
  * Delivery semantics: a replayed batch (failure between detect and
  * checkpoint commit) may re-append its signatures and re-emit its pairs
  * — at-least-once, like any side-effecting foreachBatch; duplicate pair
  * rows carry the same key and collapse under a downstream distinct, and
  * duplicate index rows only cost extra candidate checks (verification
  * keeps results exact). Exactly-once needs an idempotent store for the
  * index (e.g. batch-id-named partitions) — out of scope for the parquet
  * layout.
  */
object StreamIngest {

  /** `docs` counts the batch's documents with usable shingle content (an
    * empty/whitespace-only text has no signature and never enters the
    * index — it is not countable near-dup material). */
  final case class IngestBatch(batchId: Long, docs: Long, nearDupPairs: Long)

  /** Wire a streaming documents DataFrame through detect-then-absorb.
    *
    * @param input       streaming DataFrame with `idCol` and `textCol`
    * @param indexDir    an index created by [[Dedup.writeSignatureIndex]]
    *                    (seed it with the existing corpus — possibly empty)
    * @param charGrams   must match what the index was built with (mixing
    *                    word- and char-shingle signatures makes them
    *                    silently incomparable)
    * @param pairsSink   parquet path appending each batch's near-dup pairs
    *                    (id_new, id_index, jaccard) — intra-batch pairs
    *                    appear as (smaller id, larger id); None = counts via
    *                    onBatch only
    * @param onBatch     per-batch callback (counts for metrics/alerting)
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
        CacheScope.cached {
          // the batch's shingles+signatures are built ONCE and explicitly
          // feed detect-vs-index, detect-within-batch, AND absorb; the doc
          // count rides the same materialization (no extra source scan)
          val fresh = CacheScope.ambient.cache(
            Dedup.buildSignatureIndex(batch, idCol, textCol,
              shingleSize, numHashes, bands, charGrams))
          val n = fresh.count()
          if (n > 0) {
            val vsIndex = Dedup.storedIndexPairs(fresh, indexDir, minJaccard)
            val within = Dedup.pairsWithinIndex(fresh, minJaccard)
              .select(col("id_a").as("id_new"), col("id_b").as("id_index"), col("jaccard"))
            val pairs = vsIndex.unionByName(within)
            val pairCount = pairsSink match {
              case Some(sink) => graft.io.Sinks.observedAppend(pairs, sink)
              case None       => pairs.count()
            }
            Dedup.appendIndexFrame(fresh, indexDir)
            onBatch(IngestBatch(batchId, n, pairCount))
          }
        }
        ()
      }
      .start()
  }
}
