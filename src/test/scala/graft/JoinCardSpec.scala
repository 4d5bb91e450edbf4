package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Pins for the join-cardinality predictor: Σ ca·cb matches the real
  * join's row count, non-matching keys contribute nothing, and the
  * skew factor is exactly max_contrib · n_keys / total.
  */
class JoinCardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def keys(xs: Seq[Long]) = {
    val s = spark
    import s.implicits._
    xs.toDF("k")
  }

  test("predicted cardinality equals the actual join row count") {
    // key 1: 3x2=6, key 2: 1x4=4, key 3 left-only, key 4 right-only
    val l = keys(Seq(1L, 1L, 1L, 2L, 3L))
    val r = keys(Seq(1L, 1L, 2L, 2L, 2L, 2L, 4L))
    val got = Relational.joinCardOf(l, r, "t").collect()
    val actual = l.join(r, "k").count()
    assert(got.head.getLong(5) == actual && actual == 10L) // join_rows
    assert(got.head.getLong(6) == 2L)                       // matching keys
    val byKey = got.map(g => g.getLong(1) -> g.getLong(4)).toMap
    assert(byKey == Map(1L -> 6L, 2L -> 4L))
    // skew = max_contrib * n_keys / total = 6*2/10
    assert(got.head.getDouble(7) == 1.2)
    // ordering: contrib desc
    assert(got.head.getLong(1) == 1L)
  }

  test("disjoint key sets predict an empty join") {
    val got = Relational.joinCardOf(keys(Seq(1L)), keys(Seq(2L)), "t")
      .collect()
    assert(got.isEmpty)
  }
}
