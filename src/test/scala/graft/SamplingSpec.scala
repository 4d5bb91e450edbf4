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

  test("mixture plan: weights sum to 1000, caps and epochs are consistent") {
    val plan = Sampling.mixturePlan(spark, "/root/testdata/sf0.01").collect()
    assert(plan.map(_.getAs[Long]("weight_millis")).sum === 1000L)
    plan.foreach { r =>
      val (total, target) =
        (r.getAs[Long]("tokens_total"), r.getAs[Long]("target_tokens"))
      val (rate, epochs) =
        (r.getAs[Long]("rate_buckets"), r.getAs[Long]("epochs"))
      // rate caps at 1000 exactly when the target exceeds the source
      assert((rate == 1000L) === (target >= total), r.toString)
      // epochs is ceil(target/total), floored at one epoch
      assert(epochs === math.max(1L, (target + total - 1) / total), r.toString)
    }
    // the derived budget must exercise BOTH regimes on this corpus
    assert(plan.exists(_.getAs[Long]("epochs") > 1L))
    assert(plan.exists(_.getAs[Long]("rate_buckets") < 1000L))
  }

  test("mixture docs: selection respects each source's rate; capped sources take all") {
    val d = "/root/testdata/sf0.01"
    val rates = Sampling.mixturePlan(spark, d).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("rate_buckets"), r.getAs[Long]("n_docs"))).toMap
    val picked = Sampling.mixtureDocs(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Long]("bucket")))
    assert(picked.nonEmpty)
    picked.foreach { case (_, src, b) => assert(b < rates(src)._1) }
    val bySrc = picked.groupBy(_._2).view.mapValues(_.length).toMap
    rates.foreach { case (src, (rate, nDocs)) =>
      if (rate == 1000L) assert(bySrc.getOrElse(src, 0) === nDocs.toInt,
        s"capped source $src must select every document")
    }
  }

  test("balanced eval split: exactly k per language through TopKPerGroup") {
    val d = "/root/testdata/sf0.01"
    val df = Sampling.evalBalanced(spark, d)
    val rows = df.collect()
    val perLang = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(perLang.nonEmpty && perLang.values.forall(_ == 10),
      s"every language must contribute exactly 10 docs: $perLang")
    // ranks are a permutation of 1..k per language
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to 10))
    }
    // the rank filter plans through the custom partial+final top-k,
    // not a full per-language window sort
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.split("\n").take(25).mkString("\n"))
    assert(!plan.contains("Window"), "must not fall back to WindowExec")
  }
}
