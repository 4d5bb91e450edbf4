package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the per-source dedup impact report (`dedup_report`):
  * internal consistency with the registered drop list and the corpus
  * counts it summarizes. (Cross-engine exactness is the oracle
  * gate's job — the report's oracle embeds the drop-list SQL.)
  */
class DedupReportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("report totals equal the drop list and corpus it summarizes") {
    val rep = SparkEntry.queries("dedup_report")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(rep.map(_._2).sum === docs.count())
    val drops = SparkEntry.queries("dedup_drop_list")(spark, sf).count()
    assert(rep.map(_._4).sum === drops)
    rep.foreach { case (src, n, distinct, dropped) =>
      assert(distinct <= n, s"$src: more distinct texts than docs")
      assert(dropped < n, s"$src: dropped everything")
    }
  }
}
