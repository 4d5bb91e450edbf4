package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{GapMonitor, ReplicatedLog}
import graft.streaming.ReplicatedLog.LogRecord

/** Live gap detection via flatMapGroupsWithState (W3 as a streaming
  * operator): gaps open as out-of-order ids arrive and close when the
  * missing ids are replayed.
  */
class GapMonitorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private def rec(id: Long) = LogRecord(id, s"line-$id", ts(100 + id))

  test("gaps open on out-of-order arrival and close on replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[LogRecord]
    val q = GapMonitor.monitor(in.toDS(), bucketSize = 100L)
      .writeStream.format("memory").queryName("gap_out")
      .outputMode("update").start()
    try {
      // batch 1: 1,2,5 -> open gap [3,4]
      in.addData(rec(1), rec(2), rec(5))
      q.processAllAvailable()
      val afterB1 = spark.table("gap_out")
        .select("gapStart", "gapEnd").as[(Long, Long)].collect().toSet
      assert(afterB1 == Set((3L, 4L)))
      // batch 2: replay 3,4 and extend to 7 -> gap closes, 6 open
      in.addData(rec(3), rec(4), rec(7))
      q.processAllAvailable()
      val afterB2 = spark.table("gap_out")
        .select("gapStart", "gapEnd").as[(Long, Long)].collect().toSeq
      // update mode appends each batch's emissions; the LAST batch
      // for the bucket reports only [6,6]
      assert(afterB2.toSet.contains((6L, 6L)))
      assert(!afterB2.diff(Seq((3L, 4L))).contains((3L, 4L)))
    } finally q.stop()
  }

  test("bucketed state: gaps in different buckets are independent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[LogRecord]
    val q = GapMonitor.monitor(in.toDS(), bucketSize = 10L)
      .writeStream.format("memory").queryName("gap_out2")
      .outputMode("update").start()
    try {
      in.addData(rec(1), rec(4), rec(12), rec(15))
      q.processAllAvailable()
      val got = spark.table("gap_out2")
        .select("bucket", "gapStart", "gapEnd").as[(Long, Long, Long)]
        .collect().toSet
      assert(got == Set((0L, 2L, 3L), (1L, 10L, 11L), (1L, 13L, 14L)))
    } finally q.stop()
  }
}
