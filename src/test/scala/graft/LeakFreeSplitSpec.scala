package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Sampling}

/** Pins for the leakage-free split (`smp_split_leakfree`): members of
  * one near-dup component always share a split (the property the
  * query exists for), documents outside every component keep exactly
  * their naive document-level assignment, and the end-to-end query
  * satisfies both against the independently-computed component
  * labels at sf0.001. (Cross-engine hash exactness is the oracle
  * gate's job.)
  */
class LeakFreeSplitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def naiveSplit(id: Long): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"split:$id".getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    val b = java.lang.Long.parseLong(hex, 16) % 1000
    if (b < 980) "train" else if (b < 990) "val" else "test"
  }

  test("near-dup members co-assign; everyone else keeps the naive split") {
    val s = spark
    import s.implicits._
    val docs = (1L to 12L).map(id => (id, s"doc $id")).toDF("doc_id", "text")
    // planted labels: {1,2,9} one component, {5,7} another
    val comp = Seq((1L, 1L), (2L, 1L), (9L, 1L), (5L, 5L), (7L, 5L))
      .toDF("doc_id", "component_id")
    val out = Sampling.splitLeakFreeOver(docs, comp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.size === 12)
    assert(out(1L) === out(2L) && out(2L) === out(9L))
    assert(out(5L) === out(7L))
    assert(out(1L)._2 === naiveSplit(1L)) // group key = min-id label
    assert(out(5L)._2 === naiveSplit(5L))
    (Seq(3L, 4L, 6L, 8L, 10L, 11L, 12L)).foreach { id =>
      assert(out(id) === ((id, naiveSplit(id))),
        s"unclustered doc $id must keep its naive assignment")
    }
  }

  test("serving twin over frozen labels equals the in-plan split") {
    val live = SparkEntry.queries("smp_split_leakfree")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val idx = SparkEntry.queries("smp_split_leakfree_idx")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(idx === live)
  }

  test("end-to-end: components never straddle splits at sf0.001") {
    val out = SparkEntry.queries("smp_split_leakfree")(spark, sf)
    val comp = Dedup.components(spark, sf)
      .withColumnRenamed("component_id", "cid")
    val straddling = out.join(comp, Seq("doc_id"))
      .groupBy(col("cid")).agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(straddling === 0L)
    // and docs outside every component match smp_split's naive rule
    val naive = out.join(comp, Seq("doc_id"), "left_anti")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(naive.nonEmpty)
    naive.foreach { case (id, sp) => assert(sp === naiveSplit(id)) }
  }
}
