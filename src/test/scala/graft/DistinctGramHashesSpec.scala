package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.DistinctGramHashes.distinct_gram_hashes
import graft.functions.CrossEngine.tokens

/** The hashed distinct-gram generator vs string shingles: same set
  * sizes per doc, and the same EQUALITY structure across docs (hash
  * sets intersect exactly where string gram sets intersect) — which
  * is all the Jaccard join consumes.
  */
class DistinctGramHashesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("per-doc hash rows mirror distinct string shingles") {
    import spark.implicits._
    val viaStrings = graft.operators.Dedup.shingles(spark, sf)
      .groupBy("doc_id").agg(countDistinct(col("g")).as("n"))
      .as[(Long, Long)].collect().toMap
    val rows = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), distinct_gram_hashes(col("tk"), 3))
      .as[(Long, Long, Long)].collect()
    // n rides on every row and equals the doc's emitted row count
    // AND the string-shingle distinct count
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.keySet == viaStrings.keySet)
    byDoc.foreach { case (id, rs) =>
      assert(rs.map(_._2).distinct.size == rs.size, s"doc $id: dup hashes")
      assert(rs.head._3 == rs.size.toLong, s"doc $id: n != row count")
      assert(rs.size.toLong == viaStrings(id), s"doc $id: size mismatch")
    }
  }

  test("cross-doc intersections match string gram intersections") {
    import spark.implicits._
    val strings = graft.operators.Dedup.shingles(spark, sf)
      .filter(col("doc_id") < 40)
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val hashes = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), distinct_gram_hashes(col("tk"), 3))
      .as[(Long, Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    for (a <- strings.keys; b <- strings.keys if a < b) {
      assert((strings(a) & strings(b)).size == (hashes(a) & hashes(b)).size,
        s"intersection mismatch for ($a, $b)")
    }
  }

  test("fewer than n tokens emits nothing") {
    import spark.implicits._
    val got = Seq((1L, Seq("a", "b")), (2L, Seq("a", "b", "c")))
      .toDF("id", "tk")
      .select(col("id"), distinct_gram_hashes(col("tk"), 3))
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq == Seq(2L))
  }
}
