package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventAnalytics

/** Streaming windowed aggregation == batch result on the same data. */
case class Ev(ts: Timestamp, event_type: String, value: Double)

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
}
