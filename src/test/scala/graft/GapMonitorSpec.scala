package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.GapMonitor
import graft.streaming.ReplicatedLog.LogRecord

/** Live gap detection via transformWithState (W3 as a streaming
  * operator): gaps open as out-of-order ids arrive, close when the
  * missing ids are replayed, and a bucket that changes nothing emits
  * nothing (delta-only emission). State is one bitmap row per bucket.
  */
class GapMonitorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private def rec(id: Long) = LogRecord(id, s"line-$id", ts(100 + id))

  test("gaps open on out-of-order arrival, close on replay, deltas only") {
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
        .select("gapStart", "gapEnd", "status").as[(Long, Long, String)]
        .collect().toSet
      assert(afterB1 == Set((3L, 4L, "open")))
      // batch 2: replay 3,4 and extend to 7 -> [3,4] closes, [6,6] opens
      in.addData(rec(3), rec(4), rec(7))
      q.processAllAvailable()
      val afterB2 = spark.table("gap_out")
        .select("gapStart", "gapEnd", "status").as[(Long, Long, String)]
        .collect().toSet
      assert(afterB2 ==
        Set((3L, 4L, "open"), (3L, 4L, "closed"), (6L, 6L, "open")))
      // batch 3: duplicate replay of 5 changes nothing -> no emission
      in.addData(rec(5))
      q.processAllAvailable()
      val afterB3 = spark.table("gap_out").count()
      assert(afterB3 == 3L, "unchanged bucket must emit nothing")
      // state is one row per touched bucket, not per id
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 1L)
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
        .select("bucket", "gapStart", "gapEnd", "status")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got == Set((0L, 2L, 3L, "open"), (1L, 10L, 11L, "open"),
                        (1L, 13L, 14L, "open")))
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 2L)
    } finally q.stop()
  }

  test("openGaps bitmap helper handles edges") {
    def bm(ids: Seq[Long], bucket: Long, size: Long): Array[Byte] = {
      val bits = new Array[Byte](((size + 7) / 8).toInt)
      ids.foreach { id =>
        val off = (id - bucket * size).toInt
        bits(off >> 3) = (bits(off >> 3) | (1 << (off & 7))).toByte
      }
      bits
    }
    // empty bucket -> no gaps
    assert(GapMonitor.openGaps(0L, new Array[Byte](13), 100L).isEmpty)
    // contiguous from start -> no gaps
    assert(GapMonitor.openGaps(0L, bm(Seq(1, 2, 3), 0, 100), 100L).isEmpty)
    // hole below the high-water mark only
    assert(GapMonitor.openGaps(0L, bm(Seq(1, 5), 0, 100), 100L) ==
      Seq((2L, 4L)))
    // second bucket starts at its base, not at startId
    assert(GapMonitor.openGaps(1L, bm(Seq(100, 103), 1, 100), 100L) ==
      Seq((101L, 102L)))
    // last id of the bucket set
    assert(GapMonitor.openGaps(0L, bm(Seq(99), 0, 100), 100L) ==
      Seq((1L, 98L)))
  }
}
