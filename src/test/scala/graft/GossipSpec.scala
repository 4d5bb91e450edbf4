package graft

import org.scalatest.funsuite.AnyFunSuite

/** Branch coverage of Gossip.mergeLeft against the reference rules
  * (gossip/gossip.go:87-108): staleness flip, alive-gated higher-hb
  * win, dead-rumor rejection, restart revival, equal-hb keep-left,
  * one-sided pass-through.
  */
class GossipSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val now = 10_000_000_000L // epoch µs
  private val timeoutSec = 100L     // stale once ts_us < now - 100e6

  private def table(rows: Seq[(Long, Long, Long, Boolean)]) = {
    import spark.implicits._
    rows.toDF("id", "hb", "ts_us", "alive")
  }

  private val fresh = now - 1000000L      // well within the timeout
  private val stale = now - 200000000L    // 200 s ago — past the timeout

  test("mergeLeft applies every reference branch") {
    val left = table(Seq(
      (1L, 5L, fresh, true),   // right has higher hb + alive → right wins
      (2L, 5L, fresh, true),   // right higher hb but DEAD → left stands
      (3L, 9L, stale, true),   // left goes stale; right alive lower hb → revival
      (4L, 5L, fresh, true),   // equal hb → left stands
      (5L, 5L, stale, true),   // left-only: stale pass flips alive to false
      (7L, 2L, fresh, false),  // left dead, right alive higher hb → right wins
    ))
    val right = table(Seq(
      (1L, 8L, fresh, true),
      (2L, 9L, fresh, false),
      (3L, 1L, fresh, true),
      (4L, 5L, fresh, false),
      (6L, 3L, fresh, true),   // right-only: passes through
      (7L, 4L, fresh, true),
    ))
    val out = graft.operators.Gossip.mergeLeft(left, right, now, timeoutSec)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))).toMap

    assert(out(1L) == ((8L, fresh, true, "right")))
    assert(out(2L) == ((5L, fresh, true, "left")))
    assert(out(3L) == ((1L, fresh, true, "right")), "restart revival must win")
    assert(out(4L) == ((5L, fresh, true, "left")), "equal hb keeps local")
    assert(out(5L) == ((5L, stale, false, "left")), "stale left flips to dead")
    assert(out(6L) == ((3L, fresh, true, "right")))
    assert(out(7L) == ((4L, fresh, true, "right")))
    assert(out.size == 7)
  }

  test("merge is idempotent: merging a table into itself is a no-op on fresh rows") {
    val t = table(Seq((1L, 5L, fresh, true), (2L, 3L, fresh, false)))
    val out = graft.operators.Gossip.mergeLeft(t, t, now, timeoutSec)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3), r.getString(4)))
    assert(out.toSet == Set((1L, 5L, true, "left"), (2L, 3L, false, "left")))
  }
}
