package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational
import graft.streaming.StreamingScd2

/** The live CDC run compression must equal the batch `evt_scd2` query
  * on the CLOSED runs — across micro-batch boundaries, with
  * within-batch disorder sorted away — leaving exactly one still-open
  * tail run per user unemitted, and state bounded to one row per user.
  */
class StreamingScd2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val baseUs = 1709250000000000L

  // (user, µs offset, event_id, type) — user 1: a a b a; user 2: b b
  private val feed: Seq[(Long, Long, Long, String)] = Seq(
    (1L, 0L, 1L, "a"), (1L, 60L, 2L, "a"), (1L, 120L, 3L, "b"),
    (1L, 180L, 4L, "a"),
    (2L, 0L, 5L, "b"), (2L, 60L, 6L, "b"))
    .map { case (u, off, eid, t) => (u, baseUs + off * 1000000L, eid, t) }

  private def batchRows = {
    val s = spark
    import s.implicits._
    val ev = feed.map { case (u, us, eid, t) =>
      (eid, new Timestamp(us / 1000L), u, t)
    }.toDF("event_id", "ts", "user_id", "event_type")
    Relational.scd2Of(ev).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getTimestamp(4).getTime * 1000L, r.getTimestamp(5).getTime * 1000L))
      .toSet
  }

  test("closed runs equal batch scd2 minus the open tail per user") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingScd2.In]
    val q = StreamingScd2.runs(in.toDS())
      .writeStream.format("memory").queryName("scd2_out")
      .outputMode("append").start()
    try {
      // batches split mid-run; batch 2 arrives internally shuffled
      in.addData(feed.take(2): _*)
      q.processAllAvailable()
      in.addData(feed.slice(2, 5).reverse: _*)
      q.processAllAvailable()
      in.addData(feed.drop(5): _*)
      q.processAllAvailable()
      val streamed = spark.table("scd2_out").as[StreamingScd2.RunRow]
        .collect()
        .map(r => (r.user_id, r.run_seq, r.event_type, r.n_events,
          r.from_us, r.to_us)).toSet
      val batch = batchRows
      // open tails: user 1 run 3 ("a"), user 2 run 1 ("b")
      val openTails = batch.filter { case (u, seq, _, _, _, _) =>
        (u == 1L && seq == 3L) || (u == 2L && seq == 1L)
      }
      assert(openTails.size == 2)
      assert(streamed == batch -- openTails)
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 2L,
        "one state row per user")
    } finally q.stop()
  }

  test("an extending run emits nothing (delta-only)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingScd2.In]
    val q = StreamingScd2.runs(in.toDS())
      .writeStream.format("memory").queryName("scd2_out2")
      .outputMode("append").start()
    try {
      in.addData((1L, baseUs, 1L, "a"))
      q.processAllAvailable()
      in.addData((1L, baseUs + 1000000L, 2L, "a")) // same type — extends
      q.processAllAvailable()
      assert(spark.table("scd2_out2").count() == 0L)
      in.addData((1L, baseUs + 2000000L, 3L, "b")) // change — closes run 1
      q.processAllAvailable()
      val rows = spark.table("scd2_out2").as[StreamingScd2.RunRow].collect()
      assert(rows.length == 1 && rows.head.n_events == 2L &&
        rows.head.event_type == "a" && rows.head.run_seq == 1L)
    } finally q.stop()
  }
}
