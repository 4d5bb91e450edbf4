package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventAnalytics

/** Streaming windowed aggregation == batch result on the same data. */
case class Ev(ts: Timestamp, event_type: String, value: Double)
case class UEv(ts: Timestamp, user_id: Long)

class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("streaming windowed stats match the batch twin (complete mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      Ev(ts(1), "click", 1.0), Ev(ts(5), "click", 2.0),
      Ev(ts(61), "click", 4.0), Ev(ts(62), "view", 8.0),
      Ev(ts(125), "view", 16.0))
    val in = MemoryStream[Ev]
    val q = EventAnalytics.windowedStats(in.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val streaming = spark.table("win_out")
        .orderBy("window_start", "event_type")
        .collect().map(_.toSeq).toSeq
      val batch = EventAnalytics.windowedStatsBatch(rows.toDF())
        .orderBy("window_start", "event_type")
        .collect().map(_.toSeq).toSeq
      assert(streaming == batch)
      assert(batch.size == 4) // 3 hourly windows, one with two types
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch twin across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // views at 0,10,100 for user 1 and 5 for user 2; clicks at 15
    // (matches views 0 and 10 within 30 min), 50 (matches nothing),
    // 110 (matches view 100), and user-2 click at 200 (nothing).
    // Times sit a day past the epoch: the join's state watermark is
    // clamped at 0, so an event AT exactly epoch 0 is evicted as
    // already-expired — a test-data artifact, not pipeline behavior
    def t2(min: Long) = ts(min + 1440)
    val views = Seq(UEv(t2(0), 1L), UEv(t2(10), 1L), UEv(t2(100), 1L),
                    UEv(t2(5), 2L))
    val clicks = Seq(UEv(t2(15), 1L), UEv(t2(50), 1L), UEv(t2(110), 1L),
                     UEv(t2(200), 2L))
    val vIn = MemoryStream[UEv]
    val cIn = MemoryStream[UEv]
    val q = EventAnalytics.attributedPairs(vIn.toDF(), cIn.toDF())
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // views arrive a batch BEFORE their clicks — the join must hold
      // view state across micro-batches to emit these pairs
      vIn.addData(views: _*)
      q.processAllAvailable()
      cIn.addData(clicks: _*)
      q.processAllAvailable()
      val streaming = spark.table("attr_out")
        .orderBy("user_id", "view_ts", "click_ts")
        .collect().map(_.toSeq).toSeq
      val batch = EventAnalytics.attributedPairsBatch(views.toDF(), clicks.toDF())
        .orderBy("user_id", "view_ts", "click_ts")
        .collect().map(_.toSeq).toSeq
      assert(streaming == batch)
      // exactly the 3 in-horizon pairs, with exact delays
      assert(batch.map(r => (r(0), r(3))) ===
        Seq((1L, 900L), (1L, 300L), (1L, 600L)))
    } finally q.stop()
  }

  test("left-outer attribution emits unmatched views once the watermark expires them") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t2(min: Long) = ts(min + 1440)
    // user 1's view converts; user 2's view gets no click; the late
    // sentinel click (no match — wrong horizon AND user 99) exists
    // only to push the watermark past every view's horizon so the
    // engine can PROVE the u2 view unmatched and emit its null row
    val views = Seq(UEv(t2(10), 1L), UEv(t2(20), 2L))
    val clicks = Seq(UEv(t2(25), 1L), UEv(t2(1000), 99L))
    val vIn = MemoryStream[UEv]
    val cIn = MemoryStream[UEv]
    val q = EventAnalytics.attributionOutcomes(vIn.toDF(), cIn.toDF())
      .writeStream.format("memory").queryName("outcome_out")
      .outputMode(OutputMode.Append()).start()
    try {
      vIn.addData(views: _*)
      q.processAllAvailable()
      cIn.addData(clicks: _*)
      q.processAllAvailable()
      // one more empty-input cycle lets the advanced watermark flush
      // the proven-unmatched view from state as a null-click row
      vIn.addData(UEv(t2(1001), 1L))
      q.processAllAvailable()
      val streaming = spark.table("outcome_out")
        .filter($"view_ts" < t2(1001))
        .orderBy("user_id", "view_ts")
        .collect().map(_.toSeq).toSeq
      val batch = EventAnalytics.attributionOutcomesBatch(views.toDF(), clicks.toDF())
        .orderBy("user_id", "view_ts")
        .collect().map(_.toSeq).toSeq
      assert(streaming == batch)
      assert(batch.map(r => (r(0), r(3))) === Seq((1L, 900L), (2L, null)))
    } finally q.stop()
  }

  test("session windows merge on activity and close after the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // user 1: events at 0,10,20 min (one session 0..50), then 120
    // (second session); user 2: single event
    val rows = Seq(
      UEv(ts(0), 1L), UEv(ts(10), 1L), UEv(ts(20), 1L),
      UEv(ts(120), 1L), UEv(ts(7), 2L))
    val in = MemoryStream[UEv]
    val q = EventAnalytics.sessionStats(in.toDF())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val streaming = spark.table("sess_out")
        .orderBy("user_id", "session_start")
        .collect().map(_.toSeq).toSeq
      val batch = EventAnalytics.sessionStatsBatch(rows.toDF())
        .orderBy("user_id", "session_start")
        .collect().map(_.toSeq).toSeq
      assert(streaming == batch)
      // user 1 has two sessions (3 events, then 1); user 2 one session
      val byUser = streaming.groupBy(_(2)).view.mapValues(_.map(_(3)))
      assert(byUser(1L).toSet === Set(3L, 1L))
      assert(byUser(2L) === Seq(1L))
    } finally q.stop()
  }
}
