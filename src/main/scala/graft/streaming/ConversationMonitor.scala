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

  /** State schema v2 (maxTsMs added). A streaming query restarted from a
    * checkpoint written by the 3-field v1 state will fail Spark's state
    * schema compatibility check — discard the checkpoint (or disable
    * `spark.sql.streaming.stateStore.stateSchemaCheck`) when upgrading a
    * live monitor; dedup/gap state restarts cold. */
  final case class ConvState(
      maxTurn: Int,
      turnCount: Long,
      recentTurns: Seq[Int], // bounded window for cross-batch dup detection
      maxTsMs: Long = Long.MinValue) // event-time high-water at the turn frontier

  final case class TurnAnomaly(
      conv_id: String,
      kind: String, // duplicate_turn | out_of_order | negative_turn | ts_regression
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
        val isDup = st.recentTurns.contains(t.turn_idx)
        val advances = !isDup && t.turn_idx > st.maxTurn
        if (isDup)
          out += TurnAnomaly(convId, "duplicate_turn", t.turn_idx,
            s"turn ${t.turn_idx} seen again (window=$RecentWindow)")
        else if (t.turn_idx < st.maxTurn)
          out += TurnAnomaly(convId, "out_of_order", t.turn_idx,
            s"turn ${t.turn_idx} after max ${st.maxTurn}")
        // the streaming face of the batch monotonic rule: a turn EXTENDING
        // the conversation must not carry event time behind the frontier
        // high-water (late fills below maxTurn have unknown neighbors and
        // are already flagged out_of_order — no ts verdict on them)
        if (advances && t.ts != null && st.maxTsMs != Long.MinValue &&
            t.ts.getTime < st.maxTsMs)
          out += TurnAnomaly(convId, "ts_regression", t.turn_idx,
            s"ts ${t.ts} behind frontier ${new java.sql.Timestamp(st.maxTsMs)}")
        // duplicates do NOT advance turnCount (or re-enter the window):
        // turnCount approximates "distinct indexes seen", which is what the
        // close-time gap check compares against maxTurn+1 — counting a
        // duplicate would mask a genuine gap (0,1,1,3 must still report
        // turn 2 missing). A late out-of-order fill DOES count: it closes
        // the gap it fills. Duplicates older than the bounded window are
        // indistinguishable from fills — the documented window trade.
        st =
          if (isDup) st
          else ConvState(
            math.max(st.maxTurn, t.turn_idx),
            st.turnCount + 1,
            (t.turn_idx +: st.recentTurns).take(RecentWindow),
            if (advances && t.ts != null) math.max(st.maxTsMs, t.ts.getTime)
            else st.maxTsMs)
      }
    }
    state.update(st)
    out.iterator
  }

  /** Wire a streaming Dataset[Turn] into the stateful anomaly monitor.
    * NoTimeout variant: simplest wiring, state never evicted — use
    * [[anomaliesWithTimeout]] in any long-running deployment so state stays
    * bounded by LIVE conversations. */
  def anomalies(turns: Dataset[Turn]): Dataset[TurnAnomaly] = {
    import turns.sparkSession.implicits._
    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        anomaliesOf)
  }

  /** Timed-out / closed-conversation handling for [[anomaliesWithTimeout]]:
    * per incoming batch the group's timeout is (re)armed at
    * max-event-time + idleGap; when the WATERMARK passes it, the
    * conversation is finalized — a `conversation_closed` row is emitted
    * (with a `turn_gap` row when indexes 0..maxTurn were not all seen) and
    * `state.remove()` frees the slot. State is therefore provably bounded:
    * a conversation idle longer than idleGap in event time cannot hold
    * state once the watermark advances. */
  private[streaming] def anomaliesOfWithTimeout(idleGapMs: Long)(
      convId: String,
      turns: Iterator[Turn],
      state: GroupState[ConvState]): Iterator[TurnAnomaly] = {
    if (state.hasTimedOut) {
      val st = state.getOption.getOrElse(ConvState(-1, 0L, Nil))
      state.remove()
      val expected = st.maxTurn + 1L
      val closed = TurnAnomaly(convId, "conversation_closed", st.maxTurn,
        s"idle past watermark; turns=${st.turnCount} expected=$expected")
      if (st.turnCount < expected)
        Iterator(closed, TurnAnomaly(convId, "turn_gap", st.maxTurn,
          s"missing=${expected - st.turnCount} of 0..${st.maxTurn}"))
      else Iterator.single(closed)
    } else {
      val batch = turns.toSeq // bounded: one conversation's rows in one micro-batch
      val out = anomaliesOf(convId, batch.iterator, state).toVector
      val maxEventMs = batch.iterator.flatMap(t => Option(t.ts)).map(_.getTime)
        .foldLeft(Long.MinValue)(math.max)
      // the timeout timestamp must sit strictly beyond the current watermark
      val floor = state.getCurrentWatermarkMs() + 1L
      state.setTimeoutTimestamp(math.max(maxEventMs + idleGapMs, floor))
      out.iterator
    }
  }

  /** [[anomalies]] with event-time conversation eviction: requires a
    * watermark on `ts` (applied here). Idle conversations close and emit
    * their finalization anomalies once the watermark passes
    * last-event + idleGap, keeping state O(live conversations). */
  def anomaliesWithTimeout(
      turns: Dataset[Turn],
      idleGap: java.time.Duration = java.time.Duration.ofMinutes(10),
      watermark: String = "5 minutes"): Dataset[TurnAnomaly] = {
    import turns.sparkSession.implicits._
    turns.withWatermark("ts", watermark)
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        anomaliesOfWithTimeout(idleGap.toMillis))
  }

  /** Streaming exact dedup on the composite key with BOUNDED state: a
    * duplicate (conv_id, turn_idx) arriving within the watermark is dropped
    * exactly; key state older than the watermark ages out (a duplicate
    * arriving later than `watermark` after the original passes — the
    * documented trade every watermarked streaming dedup makes). This is the
    * ingest-side guard in front of the validator: downstream batch
    * uniqueness rules then measure genuine key collisions, not transport
    * retries. */
  def dedupWithinWatermark(
      turns: Dataset[Turn], watermark: String = "10 minutes"): Dataset[Turn] =
    turns.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("conv_id", "turn_idx")

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
