package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** The properties that make hash-bucket sampling the only sampling
  * design that survives a multi-run pipeline: invariance to physical
  * layout and extendability of rates. (Cross-engine exactness is the
  * smp_* oracle gate's job.)
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("sample is invariant to partitioning (retry/layout independence)") {
    val base = Sampling.sample(spark, sf).collect().map(_.getLong(0)).toSeq
    // same query over a repartitioned, shuffled-order view of the table
    val docs = graft.sources.Tables.documents(spark, sf)
      .repartition(17, col("source")).sortWithinPartitions(col("n_chars"))
    docs.createOrReplaceTempView("docs_reshuffled")
    val rehashed = docs
      .withColumn("bucket",
        graft.functions.CrossEngine.portableHash(
          concat(lit("sample:"), col("doc_id").cast("string"))) % 1000)
      .filter(col("bucket") < 100)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq.sorted
    assert(base.sorted === rehashed)
  }

  test("a 10% sample is a strict subset of the 20% sample (extendability)") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .withColumn("bucket",
        graft.functions.CrossEngine.portableHash(
          concat(lit("sample:"), col("doc_id").cast("string"))) % 1000)
    val at10 = docs.filter(col("bucket") < 100).select("doc_id")
    val at20 = docs.filter(col("bucket") < 200).select("doc_id")
    assert(at10.except(at20).isEmpty)
    assert(at20.count() > at10.count())
  }

  test("splits partition the corpus exactly") {
    val counts = Sampling.splitCounts(spark, sf)
      .groupBy().agg(sum(col("n")).as("total")).head().getLong(0)
    assert(counts === graft.sources.Tables.documents(spark, sf).count())
  }
}
