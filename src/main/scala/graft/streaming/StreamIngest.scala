package graft.streaming

import graft.operators.{CacheScope, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming near-duplicate INGEST: each micro-batch of documents is
  * checked against the ON-DISK signature index
  * ([[graft.operators.Dedup.writeSignatureIndex]] layout) and then
  * absorbed into it — so every batch sees every previously ingested
  * document. This is the production ingest loop for a continuously
  * growing corpus, expressed as a Structured Streaming sink.
  *
  * `foreachBatch` is the right tool here (not a streaming-native join):
  * the per-batch work is a BATCH join against at-rest bucketed tables,
  * and the detect-THEN-absorb ordering inside one batch is a side-effect
  * sequence no declarative streaming join expresses. Delivery semantics:
  * a replayed batch (failure between detect and checkpoint commit) may
  * re-append its signatures and re-emit its pairs — at-least-once, like
  * any side-effecting foreachBatch; duplicate pair rows carry the same
  * (id_new, id_index) key and collapse under a downstream distinct, and
  * duplicate index rows only cost extra candidate checks (verification
  * keeps results exact). Exactly-once needs an idempotent store for the
  * index (e.g. batch-id-named partitions) — out of scope for the parquet
  * layout.
  */
object StreamIngest {

  final case class IngestBatch(batchId: Long, docs: Long, nearDupPairs: Long)

  /** Wire a streaming documents DataFrame through detect-then-absorb.
    *
    * @param input       streaming DataFrame with `idCol` and `textCol`
    * @param indexDir    an index created by [[Dedup.writeSignatureIndex]]
    *                    (seed it with the existing corpus — possibly empty)
    * @param pairsSink   parquet path appending each batch's near-dup pairs
    *                    (id_new, id_index, jaccard); None = onBatch only
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
      pairsSink: Option[String] = None,
      triggerMs: Long = 60000L,
      onBatch: IngestBatch => Unit = _ => ()): StreamingQuery = {

    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val n = batch.count()
        if (n > 0) {
          // scratch (the batch's shingles+signatures) is reused by the
          // detect join AND the absorb write, then released
          val pairCount = CacheScope.cached {
            val pairs = Dedup.minHashLshPairsAgainstStoredIndex(
              batch, idCol, textCol, indexDir,
              shingleSize, numHashes, bands, minJaccard)
            val count = pairsSink match {
              case Some(sink) =>
                val obs = org.apache.spark.sql.Observation()
                pairs.observe(obs, org.apache.spark.sql.functions.count(
                  org.apache.spark.sql.functions.lit(1)).as("rows"))
                  .write.mode("append").parquet(sink)
                obs.get("rows").asInstanceOf[Long]
              case None => pairs.count()
            }
            Dedup.appendToSignatureIndex(batch, idCol, textCol, indexDir,
              shingleSize, numHashes, bands)
            count
          }
          onBatch(IngestBatch(batchId, n, pairCount))
        }
        ()
      }
      .start()
  }
}
