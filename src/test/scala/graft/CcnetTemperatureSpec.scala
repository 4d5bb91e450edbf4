package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sampling, TextPipeline}

/** CCNet tercile bucketing and temperature-scaled language sampling:
  * plain-Scala differentials for the threshold/share arithmetic, the
  * bucket-monotonicity invariant, and the one-corpus-pass exchange
  * reuse pin (the smp_dsir lesson applied to both).
  */
class CcnetTemperatureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def pr(x: Double, dp: Int): Double = {
    val m = math.pow(10, dp)
    math.floor(x * m + 0.5) / m
  }

  /** Spark Percentile's exact interpolation at p over sorted values. */
  private def pct(sorted: IndexedSeq[Double], p: Double): Double = {
    val pos = p * (sorted.length - 1)
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
  }

  test("ccnet buckets equal a plain-Scala recomputation of the terciles") {
    val rows = TextPipeline.ccnetBuckets(spark, sf).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getString(1))
    assert(byLang.size > 1, "corpus must exercise more than one language")
    byLang.foreach { case (lang, rs) =>
      val sorted = rs.map(_.getDouble(2)).sorted.toIndexedSeq
      val t1 = pr(pct(sorted, 1.0 / 3), 6)
      val t2 = pr(pct(sorted, 2.0 / 3), 6)
      rs.foreach { r =>
        val want =
          if (r.getDouble(2) >= t2) "head"
          else if (r.getDouble(2) >= t1) "middle"
          else "tail"
        assert(r.getString(3) == want,
          s"$lang doc ${r.getLong(0)} score ${r.getDouble(2)}: " +
            s"got ${r.getString(3)}, terciles ($t1, $t2)")
      }
      // monotone by construction AND all three grades used per lang
      assert(Set("head", "middle", "tail").subsetOf(rs.map(_.getString(3)).toSet),
        s"$lang must populate all three buckets")
    }
  }

  test("ccnet plans the bigram subtree once (exchange reuse)") {
    val df = TextPipeline.ccnetBuckets(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(plan).nonEmpty,
      "threshold branch recomputes the LM-score subtree instead of " +
        "reusing its exchange:\n" + plan.split("\n").take(40).mkString("\n"))
  }

  test("temperature mixture equals the XLM-R arithmetic on a planted corpus") {
    import spark.implicits._
    // hi-resource lang: 80 docs x 10 tokens; lo-resource: 4 docs x 5
    val docs = ((1L to 80L).map(i => (i, "hi", "alpha beta gamma delta epsilon zeta eta theta iota kappa")) ++
      (81L to 84L).map(i => (i, "lo", "uno dos tres cuatro cinco"))).toDF("doc_id", "lang", "text")
    val got = Sampling.temperatureMixtureOf(docs).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val tok = Map("hi" -> 800L, "lo" -> 20L)
    val grand = tok.values.sum.toDouble
    val s = tok.map { case (l, t) => l -> math.floor(math.pow(t / grand, 0.3) * 1e6 + 0.5).toLong }
    val sSum = s.values.sum.toDouble
    tok.foreach { case (l, t) =>
      val p = math.floor(t / grand * 1e6 + 0.5).toLong
      val q = math.floor(s(l) / sSum * 1e6 + 0.5).toLong
      val boost = math.floor(q.toDouble / math.max(p, 1L) * 1000 + 0.5).toLong
      assert(got(l) == ((if (l == "hi") 80L else 4L, t, p, q, boost)), s"lang $l mismatch: ${got(l)}")
    }
    // the point of the method: low-resource boosted, high-resource damped
    assert(got("lo")._5 > 1000L && got("hi")._5 < 1000L)
  }

  test("temperature docs keep all of the most-boosted language and respect rates") {
    val plan = Sampling.temperatureMixture(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    val maxBoost = plan.values.max
    val sel = Sampling.temperatureDocs(spark, sf).collect()
    val perLangSel = sel.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    plan.foreach { case (lang, boost) =>
      val rate = boost * 1000 / maxBoost
      if (rate == 1000L)
        assert(perLangSel(lang) == docs(lang), s"$lang at rate 1000 must keep all")
      assert(perLangSel.getOrElse(lang, 0L) <= docs(lang))
      // bucket predicate actually enforced
      sel.filter(_.getString(1) == lang).foreach(r => assert(r.getLong(2) < rate))
    }
  }

  test("persisted ccnet cuts round-trip and reproduce the one-shot buckets") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("ccnet_cuts").toString
    val oneShot = TextPipeline.ccnetBuckets(spark, sf).collect()
    TextPipeline.saveCcnetCuts(TextPipeline.ccnetCuts(spark, sf), s"$dir/cuts")
    val loaded = TextPipeline.loadCcnetCuts(spark, s"$dir/cuts")
    val rebucketed = TextPipeline.ccnetBucketsWith(docs, loaded).collect()
    assert(rebucketed.length == oneShot.length && oneShot.nonEmpty)
    assert(rebucketed.map(_.toSeq.toList).toList == oneShot.map(_.toSeq.toList).toList,
      "frozen-cuts bucketing diverged from the one-shot run")
  }

  test("temperature mixture reuses the per-language token aggregate") {
    val df = Sampling.temperatureMixture(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(plan).nonEmpty,
      "grand/denominator branches recompute the token pass instead of " +
        "reusing its exchange:\n" + plan.split("\n").take(40).mkString("\n"))
  }
}
