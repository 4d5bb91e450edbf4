package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Pins for the compaction planner: first-fit-in-order packing
  * arithmetic on an exclusive prefix sum (a file absorbs the doc that
  * crosses the target, the next doc starts the next file), per-source
  * independence, and partition-count invariance of the plan.
  */
class CompactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val T = 16384L // CompactTargetBytes

  private def docs(rows: Seq[(String, Long, Long)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("source", "doc_id", "n_chars")
  }

  test("first-fit packing: the crossing doc stays, the next one starts a file") {
    val d = docs(Seq(
      ("a", 1L, 10000L), ("a", 2L, 10000L), ("a", 3L, 10000L),
      ("b", 7L, 1L)))
    val got = Relational.compactionOf(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // a: docs 1+2 fill file 0 (20000 — the crossing doc is absorbed),
    //    doc 3's exclusive prefix 20000 ≥ T → file 1
    assert(got.toSeq == Seq(
      ("a", 0L, 2L, 20000L, 1L, 2L),
      ("a", 1L, 1L, 10000L, 3L, 3L),
      ("b", 0L, 1L, 1L, 7L, 7L)))
  }

  test("exact-boundary doc starts the next file") {
    val d = docs(Seq(("a", 1L, T), ("a", 2L, 5L)))
    val got = Relational.compactionOf(d).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 1L, T), (1L, 1L, 5L)))
  }

  test("packing is partition-count invariant (distributed prefix sum)") {
    val rows = (1 to 300).map(i =>
      (s"s${i % 5}", i.toLong, (i * 997 % 9000 + 100).toLong))
    val one = Relational.compactionOf(docs(rows).repartition(1)).collect().toSeq
    val many = Relational.compactionOf(docs(rows).repartition(13)).collect().toSeq
    assert(one == many)
    // every source's files cover all its docs exactly once
    val total = one.map(_.getLong(2)).sum
    assert(total == 300L)
  }
}
