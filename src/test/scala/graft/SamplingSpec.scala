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

  test("stratified sample applies the per-language rate to each stratum") {
    import spark.implicits._
    val strat = Sampling.stratifiedSample(spark, sf)
    val byLang = strat.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val totals = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // every language is present in the sample, and the dominant
    // language's realized rate sits well below the upsampled ones
    // (en target 10% vs 50% elsewhere; hash buckets land near target)
    assert(totals.keySet == byLang.keySet)
    val rates = totals.map { case (l, n) =>
      l -> byLang(l).toDouble / n }
    assert(rates("en") < 0.25, s"en rate ${rates("en")}")
    (rates - "en").foreach { case (l, r) =>
      assert(r > 0.3 && r < 0.7, s"$l rate $r outside 50% +- 20pp") }
  }

  test("splits partition the corpus exactly") {
    val counts = Sampling.splitCounts(spark, sf)
      .groupBy().agg(sum(col("n")).as("total")).head().getLong(0)
    assert(counts === graft.sources.Tables.documents(spark, sf).count())
  }
}
