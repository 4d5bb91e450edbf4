package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Pins for the run-length SCD2 build and the native session windows:
  * planted per-user sequences with known runs, timestamp ties broken
  * by event_id, and the exact half-open gap boundary (a gap of
  * EXACTLY the session gap splits; one microsecond less merges).
  */
class Scd2SessionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val base = 1709250000000000L // epoch µs, ~2024-03
  private def tsAt(us: Long) = new Timestamp((base + us) / 1000)

  // Timestamp carries millis; keep all offsets millisecond-aligned so
  // nothing is truncated on the way in
  private val M = 60L * 1000000L // one minute in µs

  private def mkEvents(rows: Seq[(Long, Long, Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.map { case (eid, uid, us, typ) => (eid, tsAt(us), uid, typ) }
      .toDF("event_id", "ts", "user_id", "event_type")
  }

  test("scd2 compresses consecutive same-type events into runs") {
    val ev = mkEvents(Seq(
      (1L, 1L, 0 * M, "a"), (2L, 1L, 1 * M, "a"), (3L, 1L, 2 * M, "b"),
      (4L, 1L, 3 * M, "a"),
      (5L, 2L, 0 * M, "b")))
    val got = Relational.scd2Of(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, "a", 2L), (1L, 2L, "b", 1L), (1L, 3L, "a", 1L),
      (2L, 1L, "b", 1L)))
  }

  test("scd2 ties on ts are ordered by event_id (engine-total order)") {
    // same timestamp, types differ — event_id decides the run order
    val ev = mkEvents(Seq(
      (2L, 1L, 0 * M, "b"), (1L, 1L, 0 * M, "a"), (3L, 1L, 1 * M, "b")))
    val got = Relational.scd2Of(ev).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "a", 1L), (2L, "b", 2L)))
  }

  test("scd2 from/to span the run exactly") {
    val ev = mkEvents(Seq(
      (1L, 1L, 0 * M, "a"), (2L, 1L, 5 * M, "a"), (3L, 1L, 9 * M, "b")))
    val run1 = Relational.scd2Of(ev).collect()(0)
    assert(run1.getTimestamp(4) == tsAt(0) && run1.getTimestamp(5) == tsAt(5 * M))
  }

  test("session gap boundary: exactly 30 min MERGES, 30 min + 1 ms splits") {
    // pins the engine semantic the oracle must mirror (`>` not `>=`):
    // boundary-touching session windows coalesce in Spark
    val ev = mkEvents(Seq(
      (1L, 1L, 0 * M, "a"), (2L, 1L, 30 * M, "a"),          // exact gap
      (3L, 2L, 0 * M, "a"), (4L, 2L, 30 * M + 1000L, "a"))) // 1 ms more
    val got = Relational.sessionWindowsOf(ev).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3)))
    val u1 = got.filter(_._1 == 1L)
    val u2 = got.filter(_._1 == 2L)
    assert(u1.length == 1 && u1.head._4 == 2L)
    assert(u2.length == 2 && u2.forall(_._4 == 1L))
    // end = last event + gap, start = first event
    assert(u1.head._2 == tsAt(0) && u1.head._3 == tsAt(60 * M))
    assert(u2.head._2 == tsAt(0) && u2.head._3 == tsAt(30 * M))
  }

  test("session rows conserve the event count") {
    val ev = mkEvents((1 to 40).map(i =>
      (i.toLong, (i % 3).toLong, i * 17 * M, "a")))
    val got = Relational.sessionWindowsOf(ev).collect()
    assert(got.map(_.getLong(3)).sum == 40L)
  }
}
