package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.FunnelEvent

/** Streaming funnel state machine == batch q32_funnel under ordered
  * arrival, including cross-batch advancement and the strict-ordering
  * traps the batch spec plants.
  */
class StreamingFunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private def ts(min: Long) = new Timestamp((1440 + min) * 60000L)

  test("funnel advancements match the batch funnel across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // batch 1: u1 views+clicks, u2 views, u3 clicks (no view yet),
    //          u4 full chain but purchase ties the click ts
    val b1 = Seq(
      FunnelEvent(1L, "view", ts(1)), FunnelEvent(1L, "click", ts(2)),
      FunnelEvent(2L, "view", ts(1)),
      FunnelEvent(3L, "click", ts(1)),
      FunnelEvent(4L, "view", ts(1)), FunnelEvent(4L, "click", ts(3)),
      FunnelEvent(4L, "purchase", ts(3)))
    // batch 2: u1 purchases (cross-batch advance), u2 clicks, u3 views
    //          (too late for its earlier click), u4 purchases properly
    val b2 = Seq(
      FunnelEvent(1L, "purchase", ts(10)),
      FunnelEvent(2L, "click", ts(11)),
      FunnelEvent(3L, "view", ts(12)),
      FunnelEvent(4L, "purchase", ts(13)))
    val in = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.steps(in.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("funnel_out")
        .as[StreamingFunnel.FunnelStep].collect()
      // max depth per user from the advancement stream
      val depth = got.groupBy(_.user_id).view.mapValues(_.map(_.depth).max).toMap
      assert(depth == Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 3))
      // u4's intra-batch tie (purchase AT the click ts) must not
      // advance in batch 1; the later batch-2 purchase does — so u4
      // emits exactly three advancement rows (depths 1, 2, 3)
      assert(got.count(_.user_id == 4L) == 3)
      assert(got.filter(_.user_id == 4L).map(_.depth).sorted.toSeq == Seq(1, 2, 3))
    } finally q.stop()
  }

  test("streaming step counts equal batch q32_funnel under ordered arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(
      FunnelEvent(1L, "view", ts(1)), FunnelEvent(1L, "click", ts(2)),
      FunnelEvent(2L, "view", ts(3)), FunnelEvent(3L, "click", ts(4)))
    val b2 = Seq(
      FunnelEvent(1L, "purchase", ts(9)), FunnelEvent(2L, "click", ts(10)),
      FunnelEvent(3L, "view", ts(11)), FunnelEvent(2L, "purchase", ts(10)))
    val in = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.steps(in.toDS())
      .writeStream.format("memory").queryName("funnel_out2")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      val steps = spark.table("funnel_out2")
        .as[StreamingFunnel.FunnelStep].collect()
      val streamCounts = (1 to 3).map(d => steps.count(_.depth == d).toLong)
      val batch = graft.operators.Relational.q32FunnelOf(
          (b1 ++ b2).toDF("user_id", "event_type", "ts"))
        .collect().map(_.getLong(1)).toSeq
      assert(streamCounts == batch,
        s"stream $streamCounts vs batch $batch")
    } finally q.stop()
  }

  test("sub-millisecond event spacing advances (micros precision, not ms)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // view at t0, click 400µs later, purchase 800µs later — all inside
    // the SAME millisecond. Timestamp.getTime-based micros would read
    // three identical values and the strict `>` ordering would stall
    // the funnel at depth 1; full-precision micros (and the batch
    // q32_funnel, which compares microsecond timestamps) advance to 3.
    def tsMicro(micros: Int) = {
      val t = new Timestamp(1440 * 60000L) // whole second, ms part 0
      t.setNanos(micros * 1000)
      t
    }
    val evs = Seq(
      FunnelEvent(9L, "view", tsMicro(0)),
      FunnelEvent(9L, "click", tsMicro(400)),
      FunnelEvent(9L, "purchase", tsMicro(800)))
    val in = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.steps(in.toDS())
      .writeStream.format("memory").queryName("funnel_micros")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(evs: _*); q.processAllAvailable()
      val got = spark.table("funnel_micros")
        .as[StreamingFunnel.FunnelStep].collect()
      assert(got.map(_.depth).sorted.toSeq == Seq(1, 2, 3),
        s"sub-ms events must advance all three depths, got ${got.toSeq}")
      val batch = graft.operators.Relational.q32FunnelOf(
          evs.toDF("user_id", "event_type", "ts"))
        .collect().map(_.getLong(1)).toSeq
      assert(batch == Seq(1L, 1L, 1L), s"batch twin disagrees: $batch")
    } finally q.stop()
  }

  test("idle-user state is TTL-evicted: bounded state under churn") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // A processing-time TTL makes the state store demand no-data
    // micro-batches forever (proactive eviction sweeps), so the stream
    // never quiesces: `processAllAvailable` hangs, and even a
    // `Trigger.AvailableNow` run refuses to terminate (both observed).
    // TTL *enforcement on read* does not need those sweeps — `get()`/
    // `exists()` filter values whose stamped expiration has passed —
    // so the test disables no-data micro-batches for its duration,
    // which lets the stream quiesce while keeping the semantic under
    // test (an expired user reads as absent) fully live.
    val ndKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val ndPrev = spark.conf.get(ndKey)
    spark.conf.set(ndKey, "false")
    val in = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.steps(in.toDS(), ttlIdleMs = 500L)
      .writeStream.format("memory").queryName("funnel_ttl")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(FunnelEvent(7L, "view", ts(1))); q.processAllAvailable()
      Thread.sleep(1500L) // processing-time idle past the 500 ms TTL
      // State evicted: the click finds a fresh depth-0 machine (which
      // wants "view") and must NOT advance — without the TTL this
      // would emit depth 2, so observing no row here proves eviction,
      // i.e. a churned user costs no state past the horizon.
      in.addData(FunnelEvent(7L, "click", ts(2))); q.processAllAvailable()
      // ...and a fresh view restarts the funnel at depth 1.
      in.addData(FunnelEvent(7L, "view", ts(3))); q.processAllAvailable()
      val got = spark.table("funnel_ttl")
        .as[StreamingFunnel.FunnelStep].collect().sortBy(_.reached_ts.getTime)
      assert(got.map(_.depth).toSeq == Seq(1, 1),
        s"expected restart-at-depth-1 after eviction, got ${got.toSeq}")
    } finally { q.stop(); spark.conf.set(ndKey, ndPrev) }
  }
}
