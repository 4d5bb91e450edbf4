package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Pins for the mergeable-HLL distinct pattern: the union of per-batch
  * sketches must count a user seen in BOTH batches once, match the
  * exact distinct at low cardinality, and stay inside the guarded 5%
  * envelope at a few thousand distinct keys.
  */
class HllIncSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val ts = new Timestamp(1709250000000L)

  private def events(rows: Seq[(Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.map { case (eid, uid, typ) => (eid, ts, uid, typ) }
      .toDF("event_id", "ts", "user_id", "event_type")
  }

  test("cross-batch users dedupe through the sketch union") {
    // user 10 appears in BOTH parities of type a: exact distinct = 3
    val ev = events(Seq(
      (0L, 10L, "a"), (1L, 10L, "a"), (2L, 11L, "a"), (3L, 12L, "a"),
      (4L, 20L, "b")))
    val got = Relational.statsHllIncOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq == Seq(("a", 3L, true), ("b", 1L, true)))
  }

  test("the 5% envelope holds at a few thousand distinct users") {
    val ev = events((1 to 6000).map(i => (i.toLong, (i % 2500).toLong, "t")))
    val got = Relational.statsHllIncOf(ev).collect()
    // within_5pct = true only reachable if the in-plan guard passed
    assert(got.length == 1 && got.head.getLong(1) == 2500L &&
      got.head.getBoolean(2))
  }
}
