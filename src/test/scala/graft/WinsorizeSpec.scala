package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Pins for winsorized statistics on a hand-computable series:
  * values 1..100 have interpolated P05 = 5.95 and P95 = 95.05, so
  * exactly five values clip on each side and the winsorized mean is
  * (5·5.95 + Σ6..95 + 5·95.05)/100 = 50.5.
  */
class WinsorizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("clip counts and winsorized mean match the hand computation") {
    val s = spark
    import s.implicits._
    val ev = (1 to 100).map(i => ("t", i.toDouble))
      .toDF("event_type", "value")
    val r = Relational.winsorizeOf(ev).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 100L)
    assert(r.head.getLong(2) == 5L && r.head.getLong(3) == 5L)
    assert(r.head.getDouble(4) == 50.5)
  }

  test("a constant series clips nothing and keeps its mean") {
    val s = spark
    import s.implicits._
    val ev = Seq.fill(40)(("t", 7.25)).toDF("event_type", "value")
    val r = Relational.winsorizeOf(ev).collect().head
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L &&
      r.getDouble(4) == 7.25)
  }
}
