package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** Pins for the UniMax waterfill (`smp_unimax`): exact equality with
  * an independent driver recompute, budget conservation, the cap
  * invariant, deterministic remainder placement, and the degenerate
  * all-capped / zero-budget corners where the uncapped-share division
  * must never evaluate. (Cross-engine exactness is the oracle gate's
  * job; these pin the algorithm itself.)
  */
class UniMaxSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(toks: Seq[(String, Long)], epochCap: Long,
                  den: Long): Map[String, (Long, Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    Sampling.unimaxOver(toks.toDF("source", "tok"), epochCap, den)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toMap
  }

  /** Independent waterfill: ascending (cap, source), capped prefix by
    * the even-share test, remainder one-each to the lowest uncapped.
    */
  private def reference(toks: Seq[(String, Long)], epochCap: Long,
                        den: Long): Map[String, (Long, Long, Long, Long, Long)] = {
    val budget = toks.map(_._2).sum / den
    val sorted = toks.map { case (s, t) => (s, t, t * epochCap) }
      .sortBy { case (s, _, c) => (c, s) }
    val m = sorted.size
    var remaining = budget
    var idx = 0
    while (idx < m && sorted(idx)._3 * (m - idx) < remaining) {
      remaining -= sorted(idx)._3
      idx += 1
    }
    val nUnc = m - idx
    val (u, r) = if (nUnc > 0) (remaining / nUnc, remaining % nUnc) else (0L, 0L)
    sorted.zipWithIndex.map { case ((s, t, c), i) =>
      val capped = i < idx
      val alloc = if (capped) c else u + (if (i - idx + 1 <= r) 1L else 0L)
      val ep = if (t > 0) alloc * 1000000L / t else 0L
      s -> (t, c, if (capped) 1L else 0L, alloc, ep)
    }.toMap
  }

  private val mixed = Seq(("web", 1000L), ("wiki", 40L), ("books", 200L),
    ("code", 995L), ("forums", 3L))

  test("waterfill equals the independent recompute on a mixed corpus") {
    assert(run(mixed, 2L, 2L) === reference(mixed, 2L, 2L))
  }

  test("budget conserved and caps respected") {
    val out = run(mixed, 2L, 2L)
    val budget = mixed.map(_._2).sum / 2L
    assert(out.values.map(_._4).sum === budget)
    out.foreach { case (s, (_, cap, _, alloc, _)) =>
      assert(alloc <= cap, s"source $s allocated past its cap")
    }
    // uncapped sources share evenly (within the one-token remainder)
    val unc = out.values.filter(_._3 == 0L).map(_._4)
    assert(unc.nonEmpty && unc.max - unc.min <= 1L)
  }

  test("remainder goes one token each to the lowest-capacity uncapped sources") {
    // budget 7 over three equal caps of 100: u = 2, r = 1 -> the
    // (cap, source)-smallest uncapped source gets the extra token
    val toks = Seq(("a", 2L), ("b", 2L), ("c", 3L))
    // budget = 7 div 1 = 7, caps = 200/200/300 (epochCap 100): all uncapped
    val out = run(toks, 100L, 1L)
    assert(out("a")._4 === 3L) // rank 1 in (cap, source) order gets +1
    assert(out("b")._4 === 2L)
    assert(out("c")._4 === 2L)
  }

  test("all-capped corner: zero caps absorb nothing, division never runs") {
    val out = run(Seq(("a", 5L), ("b", 7L)), 0L, 1L)
    assert(out.values.forall(v => v._3 == 1L && v._4 == 0L))
  }

  test("zero-budget corner: everything uncapped at share zero") {
    val out = run(Seq(("a", 0L), ("b", 0L)), 2L, 1L)
    assert(out.values.forall(v => v._3 == 0L && v._4 == 0L && v._5 == 0L))
  }

  test("manifest realizes the allocation: per-source repeated tokens land in [alloc, alloc + one doc)") {
    val sf = "/root/testdata/sf0.001"
    val alloc = SparkEntry.queries("smp_unimax")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val rows = SparkEntry.queries("smp_unimax_docs")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._4 >= 1L), "manifest rows must repeat at least once")
    assert(rows.forall(_._4 <= 3L), "repeats bounded by epoch cap + partial")
    val bySource = rows.groupBy(_._2)
    for ((src, a) <- alloc if a > 0) {
      val got = bySource.getOrElse(src, Array.empty[(Long, String, Long, Long)])
        .map(r => r._3 * r._4).sum
      val maxDoc = bySource(src).map(_._3).max
      assert(got >= a && got < a + math.max(1L, maxDoc),
        s"$src realized $got of alloc $a (max doc $maxDoc)")
    }
  }

  test("property sweep: 25 seeded random corpora match the reference waterfill") {
    val rng = new scala.util.Random(42)
    for (i <- 1 to 25) {
      val k = 1 + rng.nextInt(12)
      val toks = (0 until k).map(j => (s"s$j", rng.nextInt(5000).toLong))
      val cap = rng.nextInt(4).toLong
      val den = 1L + rng.nextInt(4)
      assert(run(toks, cap, den) === reference(toks, cap, den),
        s"case $i: toks=$toks cap=$cap den=$den")
    }
  }

  test("capacity ties order by source name (engine-portable determinism)") {
    val toks = Seq(("zz", 2L), ("aa", 2L), ("mm", 2L))
    // budget = 6 div 1, caps 4 each: uncapped, u = 2, r = 0 -> equal
    assert(run(toks, 2L, 1L) === reference(toks, 2L, 1L))
    // budget 7: remainder lands on "aa" (tie broken by name)
    val out = run(Seq(("zz", 3L), ("aa", 3L), ("mm", 1L)), 2L, 1L)
    assert(out === reference(Seq(("zz", 3L), ("aa", 3L), ("mm", 1L)), 2L, 1L))
  }
}
