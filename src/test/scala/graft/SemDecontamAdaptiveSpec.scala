package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Pins for the round-13 scale-adaptive `smp_decontam_sem`: the
  * registered entry branches IN-PLAN on eval-set cardinality, and
  * each branch must reproduce its standalone form bit for bit — the
  * brute broadcast screen below the threshold (what the DuckDB
  * oracle checks at every gate SF) and the IVF-pruned screen above
  * it (what the 100× ladder exercises; its documented lower-bound
  * contract is pinned in SemDecontamCalibSpec).
  */
class SemDecontamAdaptiveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def vecs() = Similarity.vectorsOf(
    graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")))

  test("below the eval threshold the adaptive entry IS the brute screen") {
    val brute = Similarity.semanticDecontam(spark, sf)
      .collect().map(_.toSeq).toSeq
    val adaptive = Similarity.semanticDecontamAdaptiveOf(vecs(), 1024L)
      .collect().map(_.toSeq).toSeq
    assert(adaptive.nonEmpty)
    assert(adaptive === brute)
  }

  test("above the eval threshold the adaptive entry IS the IVF screen") {
    // sf0.001 has 10 eval vectors; a threshold of 5 forces the branch
    val ivf = Similarity.semanticDecontamIvf(spark, sf)
      .collect().map(_.toSeq).toSeq
    val adaptive = Similarity.semanticDecontamAdaptiveOf(vecs(), 5L)
      .collect().map(_.toSeq).toSeq
    assert(adaptive.nonEmpty)
    assert(adaptive === ivf)
  }

  test("the registered query picks the brute branch at the gate SF") {
    val reg = SparkEntry.queries("smp_decontam_sem")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val brute = Similarity.semanticDecontam(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(reg === brute)
  }
}
