package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Pins for the corpus-adaptive MinHash band geometry: the rule
  * itself (2-row bands up to the 8 Ki-doc boundary, 4-row beyond),
  * and the claim that justifies it — at the gate corpora the adaptive
  * geometry's candidate set achieves recall ≥ the fixed 4×4
  * geometry's at the J ≥ 0.8 exact pair set (the 8×2 S-curve
  * threshold t* ≈ 0.35 sits further below the verify gate than
  * 4×4's ≈ 0.71, so banding misses strictly fewer true pairs).
  */
class BandGeometrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def geomOf(n: Int): (Long, Long) = {
    val s = spark
    import s.implicits._
    val docs = (1 to n).map(i => (i.toLong, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val r = Dedup.bandGeometryOf(docs).collect().head
    (r.getLong(0), r.getLong(1))
  }

  test("geometry rule: 8x2 up to 8Ki docs, 4x4 beyond") {
    assert(geomOf(10) == (2L, 8L))
    assert(geomOf(8192) == (2L, 8L))
    assert(geomOf(8193) == (4L, 4L))
  }

  test("adaptive candidates reach recall >= the fixed 4x4 geometry's") {
    val s = spark
    import s.implicits._
    // exact J >= 0.8 pairs (the rational predicate, per the
    // dedup_ngram_prefix discipline)
    val exact = Dedup.ngramJaccard(spark, sf)
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    def candidates(bandRows: Int): Set[(Long, Long)] = {
      val b = Dedup.withBandKeys(
          graft.sources.Tables.documents(spark, sf), "text", bandRows)
        .select(col("doc_id"), explode(col("bands")).as("bs"))
        .select(col("doc_id"), col("bs.band").as("band"),
          col("bs.sig").as("sig"))
      b.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
        .join(b.select(col("doc_id").as("doc_b"), col("band"), col("sig")),
          Seq("band", "sig"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
        .as[(Long, Long)].collect().toSet
    }
    val adaptive = candidates(2)  // what the gate corpus gets
    val fixed = candidates(4)
    val recallA = (exact & adaptive).size.toDouble / exact.size
    val recallF = (exact & fixed).size.toDouble / exact.size
    info(s"recall 8x2 = $recallA (${adaptive.size} cands), " +
      s"4x4 = $recallF (${fixed.size} cands)")
    assert(recallA >= recallF)
    // and the adaptive batch table is what minhashPairs actually ships
    val shipped = Dedup.minhashPairs(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(shipped == adaptive)
  }
}
