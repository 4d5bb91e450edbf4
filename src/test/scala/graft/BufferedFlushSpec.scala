package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.BufferedFlush
import graft.streaming.ReplicatedLog.LogRecord

/** W5 buffered flush as a Spark 4 transformWithState processor:
  * threshold flushes inline, the processing-time timer picks up
  * stragglers, buffers clear on flush.
  *
  * NOTE: under TimeMode.ProcessingTime the engine never reports
  * quiescence (a timer may fire at any moment, so every batch
  * "requires another"), which makes processAllAvailable() block
  * forever — the spec polls the memory sink with a deadline instead.
  */
class BufferedFlushSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private def rec(id: Long) = LogRecord(id, s"v$id", ts(100))

  private def awaitCount(table: String, n: Long, timeoutMs: Long = 60000L): Unit = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (spark.table(table).count() < n) {
      if (System.currentTimeMillis() > deadline)
        fail(s"$table did not reach $n rows within ${timeoutMs} ms " +
             s"(has ${spark.table(table).count()})")
      Thread.sleep(100)
    }
  }

  test("count threshold flushes inline and clears the buffer (W5)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[LogRecord]
    val q = BufferedFlush.flushes(in.toDS(), threshold = 3, cadenceMs = 3600000L)
      .writeStream.format("memory").queryName("flush_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      // node 0: ids 1..2 (below threshold, no flush); node 1: 3 ids → flush
      in.addData(rec(1), rec(2), rec(1001), rec(1002), rec(1003))
      awaitCount("flush_out", 1)
      val after1 = spark.table("flush_out")
        .as[BufferedFlush.FlushEvent].collect().toSeq
      assert(after1.map(e => (e.node, e.reason, e.ids)) ===
             Seq((1L, "threshold", Seq(1001L, 1002L, 1003L))))
      // node 0 reaches the threshold across batches (state persisted)
      in.addData(rec(3))
      awaitCount("flush_out", 2)
      val after2 = spark.table("flush_out")
        .as[BufferedFlush.FlushEvent].collect().toSeq
      assert(after2.map(e => (e.node, e.reason, e.ids)).toSet ===
             Set((1L, "threshold", Seq(1001L, 1002L, 1003L)),
                 (0L, "threshold", Seq(1L, 2L, 3L))))
      // flushed buffers are empty: one more id must NOT re-flush node 1
      in.addData(rec(1004))
      Thread.sleep(1500)
      assert(spark.table("flush_out").count() === 2)
    } finally q.stop()
  }

  test("processing-time timer flushes stragglers (the 10 s cadence)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[LogRecord]
    val q = BufferedFlush.flushes(in.toDS(), threshold = 100, cadenceMs = 500L)
      .writeStream.format("memory").queryName("flush_timer_out")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      in.addData(rec(7), rec(9))
      // below the threshold: only the cadence timer can flush these
      awaitCount("flush_timer_out", 1)
      val events = spark.table("flush_timer_out")
        .as[BufferedFlush.FlushEvent].collect().toSeq
      assert(events.map(e => (e.node, e.reason, e.ids)) ===
             Seq((0L, "timer", Seq(7L, 9L))))
    } finally q.stop()
  }
}
