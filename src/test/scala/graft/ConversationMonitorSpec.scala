package graft

import graft.io.Turn
import graft.streaming.ConversationMonitor
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

class ConversationMonitorSpec extends SparkSpec {

  private def turn(conv: String, idx: Int, ts: Long = 1700000000000L): Turn =
    Turn(conv, idx, "user", "text", null, new Timestamp(ts))

  test("stateful monitor flags cross-batch duplicates and out-of-order turns") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[Turn]
    val anomalies = ConversationMonitor.anomalies(stream.toDS())
    val query = anomalies.writeStream
      .format("memory").queryName("anomalies").outputMode("append").start()

    // batch 1: clean ascending turns for c1; c2 starts
    stream.addData(turn("c1", 0), turn("c1", 1), turn("c1", 2), turn("c2", 0))
    query.processAllAvailable()
    // batch 2: c1 repeats turn 1 (cross-batch duplicate!), c2 jumps to 5 then
    // back to 3 (out-of-order), plus a negative index
    stream.addData(turn("c1", 1), turn("c2", 5), turn("c2", 3), turn("c2", -1))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("anomalies").as[ConversationMonitor.TurnAnomaly].collect()
    val byKind = rows.groupBy(_.kind).view.mapValues(_.map(a => (a.conv_id, a.turn_idx)).toSet).toMap
    byKind("duplicate_turn") shouldBe Set(("c1", 1))
    byKind("out_of_order") shouldBe Set(("c2", 3))
    byKind("negative_turn") shouldBe Set(("c2", -1))
    rows.length shouldBe 3 // nothing else flagged
  }

  test("ts_regression: an extending turn with event time behind the frontier is flagged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 1700000000000L
    val stream = MemoryStream[Turn]
    val query = ConversationMonitor.anomalies(stream.toDS()).writeStream
      .format("memory").queryName("ts_anoms").outputMode("append").start()
    // batch 1: turns 0,1 with advancing event time
    stream.addData(turn("c", 0, t0), turn("c", 1, t0 + 1000))
    query.processAllAvailable()
    // batch 2: turn 2 extends the conversation but its ts is BEHIND the
    // frontier → flagged; turn 0 is a (windowed) duplicate — no ts verdict
    stream.addData(turn("c", 2, t0 - 5000), turn("c", 0, t0 - 9000))
    query.processAllAvailable()
    // batch 3: a late fill BELOW maxTurn with old ts: out_of_order only —
    // its neighbors are unknown, so no ts verdict on fills
    stream.addData(turn("d", 0, t0), turn("d", 5, t0 + 1000))
    query.processAllAvailable()
    stream.addData(turn("d", 3, t0 - 7000))
    query.processAllAvailable()
    query.stop()
    val rows = spark.table("ts_anoms").as[ConversationMonitor.TurnAnomaly].collect()
    rows.filter(_.kind == "ts_regression").map(a => (a.conv_id, a.turn_idx)).toSet shouldBe
      Set(("c", 2))
    rows.filter(_.kind == "out_of_order").map(a => (a.conv_id, a.turn_idx)).toSet shouldBe
      Set(("d", 3))
  }

  test("event-time timeout closes idle conversations, reports gaps, and frees state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = 1700000000000L
    val stream = MemoryStream[Turn]
    val anomalies = ConversationMonitor.anomaliesWithTimeout(
      stream.toDS(), idleGap = java.time.Duration.ofMinutes(1), watermark = "0 seconds")
    val query = anomalies.writeStream
      .format("memory").queryName("timeout_anoms").outputMode("append").start()

    // batch 1: conv "a" has turns 0 and 2 (gap at 1); conv "b" is complete
    stream.addData(
      turn("a", 0, base), turn("a", 2, base + 1000),
      turn("b", 0, base), turn("b", 1, base + 1000))
    query.processAllAvailable()
    // batch 2: only conv "b" speaks again, one hour later — the watermark
    // jumps past a's (last event + 1 min) timeout and past b's OLD timeout,
    // but b's state was re-armed by this batch so only "a" closes
    stream.addData(turn("b", 2, base + 3600L * 1000))
    query.processAllAvailable()
    // batch 3: another hour on — now "b" (idle since batch 2) closes too
    stream.addData(turn("zz", 0, base + 7200L * 1000))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("timeout_anoms").as[ConversationMonitor.TurnAnomaly].collect()
    val closed = rows.filter(_.kind == "conversation_closed").map(_.conv_id).toSet
    closed should contain allOf ("a", "b")
    // "a" saw turns {0,2} of expected 0..2 → one missing
    val gaps = rows.filter(_.kind == "turn_gap")
    gaps.map(_.conv_id).toSet shouldBe Set("a")
    gaps.head.detail should include("missing=1")
    // closing emitted exactly once per conversation (state was removed)
    rows.count(r => r.kind == "conversation_closed" && r.conv_id == "a") shouldBe 1
  }

  test("a duplicate turn does not advance turnCount, so it cannot mask a gap") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val state = TestGroupState.create[ConversationMonitor.ConvState](
      org.apache.spark.api.java.Optional.empty(), GroupStateTimeout.NoTimeout, 0L,
      org.apache.spark.api.java.Optional.empty(), hasTimedOut = false)
    // 0,1,1,3: four arrivals, three DISTINCT indexes of expected 0..3 — the
    // old count-every-arrival logic would have turnCount=4=maxTurn+1 and
    // close without a turn_gap despite turn 2 missing
    val out = ConversationMonitor.anomaliesOf("c",
      Iterator(turn("c", 0), turn("c", 1), turn("c", 1), turn("c", 3)), state).toVector
    out.map(_.kind) shouldBe Vector("duplicate_turn")
    val st = state.get
    st.maxTurn shouldBe 3
    st.turnCount shouldBe 3L // duplicate excluded → gap check sees 3 < 4
    // a late out-of-order FILL does count — it closes the gap it fills
    val out2 = ConversationMonitor.anomaliesOf("c", Iterator(turn("c", 2)), state).toVector
    out2.map(_.kind) shouldBe Vector("out_of_order")
    state.get.turnCount shouldBe 4L
  }

  test("dedupWithinWatermark drops cross-batch duplicate keys with bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = 1700000000000L
    val stream = MemoryStream[Turn]
    val deduped = ConversationMonitor.dedupWithinWatermark(stream.toDS(), "10 minutes")
    val query = deduped.writeStream
      .format("memory").queryName("dedup_stream").outputMode("append").start()

    stream.addData(turn("a", 0, base), turn("a", 0, base + 5), turn("a", 1, base + 1000))
    query.processAllAvailable()
    // cross-batch duplicate within the watermark: dropped
    stream.addData(turn("a", 1, base + 2000), turn("b", 0, base + 3000))
    query.processAllAvailable()
    query.stop()

    val keys = spark.table("dedup_stream").as[Turn].collect()
      .map(t => (t.conv_id, t.turn_idx)).sorted
    keys shouldBe Array(("a", 0), ("a", 1), ("b", 0))
  }

  test("watermarked role histogram aggregates per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val stream = MemoryStream[Turn]
    val hist = ConversationMonitor.roleHistogram(stream.toDS().toDF(), "1 minute", "1 minute", "1 minute")
    val query = hist.writeStream
      .format("memory").queryName("rolehist").outputMode("update").start()

    val base = 1700000000000L
    stream.addData(
      Turn("c1", 0, "user", "t", null, new Timestamp(base)),
      Turn("c1", 1, "assistant", "t", null, new Timestamp(base + 1000)),
      Turn("c1", 2, "user", "t", null, new Timestamp(base + 2000)))
    query.processAllAvailable()
    query.stop()

    val rows = spark.table("rolehist").collect()
    rows.map(_.getString(1)).toSet shouldBe Set("user", "assistant")
    rows.find(_.getString(1) == "user").get.getLong(2) shouldBe 2L
  }
}
