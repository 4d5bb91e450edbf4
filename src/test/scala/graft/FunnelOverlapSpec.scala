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

  test("source overlap matrix conserves the near-dup pair count") {
    val pairs = Dedup.minhashPairs(spark, sf).collect()
    val overlap = Dedup.sourceOverlap(spark, sf).collect()
    assert(overlap.map(_.getLong(2)).sum == pairs.length.toLong)
    // canonical unordered pairs: source_a <= source_b on every row
    overlap.foreach(r => assert(r.getString(0) <= r.getString(1)))
  }
}
