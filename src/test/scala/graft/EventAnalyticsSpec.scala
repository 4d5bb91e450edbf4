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
