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

  test("explicit colliding change keys net to ONE row per key, delete-wins") {
    // The clone-rung shape the gate corpora can't produce: the same
    // merge key arrives twice in one change batch (an insert landing
    // on a key that also carries its own update/delete).
    import spark.implicits._
    val target = Seq((1L, 100L), (5L, 500L), (7L, 700L))
      .toDF("key", "bal_milli")
    val changes = Seq(
      (5L, "update", 50L), (5L, "insert", 7L),   // update+insert collide
      (1L, "delete", 0L), (1L, "insert", 3L),    // delete wins over insert
      (9L, "insert", 9L), (9L, "update", 1L)     // unmatched collision
    ).toDF("key", "op", "delta_milli")
    val got = graft.operators.Relational.mergeUpsertOf(target, changes)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.map(_._1).toSeq === got.map(_._1).distinct.toSeq,
      "no duplicate merge keys")
    assert(got.toSet === Set(
      (5L, "update", 557L),  // 500 + 50 + 7: deltas summed
      (7L, "keep", 700L),    // untouched target row survives
      (9L, "insert", 10L)))  // 9 + 1, new key
    // key 1 absent: the colliding delete won over the insert
  }
}
