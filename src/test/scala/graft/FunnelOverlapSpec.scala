package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Relational}

/** q32_funnel ordering semantics on a planted event log, and
  * dedup_source_overlap conservation against the pair list it
  * attributes.
  */
class FunnelOverlapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-02 10:$m%02d:00")

  test("funnel only advances on strictly later events of the next step") {
    import spark.implicits._
    val ev = Seq(
      // u1: full ordered funnel
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // u2: view then click, purchase BEFORE the click — depth 2
      (2L, "purchase", ts(1)), (2L, "view", ts(2)), (2L, "click", ts(3)),
      // u3: click before any view — depth 1 (the ordering trap)
      (3L, "click", ts(1)), (3L, "view", ts(2)),
      // u4: purchase at exactly the click ts — strict >, depth 2
      (4L, "view", ts(1)), (4L, "click", ts(2)), (4L, "purchase", ts(2)),
      // u5: never views — depth 0
      (5L, "click", ts(1)), (5L, "purchase", ts(2)),
    ).toDF("user_id", "event_type", "ts")
    val got = Relational.q32FunnelOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("1_view", 4L, 1000L),      // u1 u2 u3 u4
      ("2_click", 3L, 750L),      // u1 u2 u4
      ("3_purchase", 1L, 333L)))  // u1 only
  }

  test("retention cohorts count distinct users per week offset") {
    import spark.implicits._
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // weeks (Mon-anchored): W1 = Jan 1-7, W2 = Jan 8-14, W3 = Jan 15-21
    val ev = Seq(
      (1L, "view", t(2)), (1L, "view", t(3)),   // u1 cohort W1, active W1
      (1L, "click", t(16)),                     // ... and W3 (skips W2)
      (2L, "view", t(9)),                       // u2 cohort W2
      (2L, "view", t(15)),                      // ... active W3
      (3L, "view", t(4))                        // u3 cohort W1, W1 only
    ).toDF("user_id", "event_type", "ts")
    val got = Relational.q33RetentionOf(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 0L, 2L),   // u1, u3 in W1 cohort week 0
      ("2024-01-01", 2L, 1L),   // u1 back in week 2 (gap week absent)
      ("2024-01-08", 0L, 1L),   // u2 cohort
      ("2024-01-08", 1L, 1L)))  // u2 next week
  }

  test("source overlap matrix conserves the near-dup pair count") {
    val pairs = Dedup.minhashPairs(spark, sf).collect()
    val overlap = Dedup.sourceOverlap(spark, sf).collect()
    assert(overlap.map(_.getLong(2)).sum == pairs.length.toLong)
    // canonical unordered pairs: source_a <= source_b on every row
    overlap.foreach(r => assert(r.getString(0) <= r.getString(1)))
  }
}
