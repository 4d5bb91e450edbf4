package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Decontam
import graft.functions.CrossEngine.tokens

/** Decontamination contracts: planted eval overlap is found exactly,
  * the bloom-pruned plan equals an independent no-bloom computation
  * on real data, and the plan keeps the map-side probe + equi-join
  * shape (no cartesian surface anywhere).
  */
class DecontamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val evalText =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron"

  test("planted 13-gram overlap is detected with exact counts") {
    import spark.implicits._
    // doc 1 copies eval tokens 1..13 (one matching 13-gram),
    // doc 2 copies the whole 15-token eval text (three matching grams),
    // doc 3 shares nothing
    val evalDf = Seq((100L, evalText)).toDF("doc_id", "text")
    val corpusDf = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu " +
           "completely different tail words here now"),
      (2L, "prefix words " + evalText + " suffix words"),
      (3L, "unrelated content about query engines and shuffle exchanges only " +
           "padded with more words to pass the thirteen token minimum easily"))
      .toDF("doc_id", "text")
    val got = Decontam.contaminated(corpusDf, evalDf)
      .select("doc_id", "n_matched").as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == 1L)
    assert(got(2L) == 3L)
  }

  test("equals an independent no-bloom computation on the real corpus") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val toks = docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .as[(Long, Seq[String])].collect()
    val n = Decontam.GramWidth
    def grams(tk: Seq[String]): Set[String] =
      if (tk.size < n) Set.empty
      else tk.sliding(n).map(_.mkString(" ")).toSet
    val evalGrams = toks.filter(_._1 % 10 == 7).flatMap(t => grams(t._2)).toSet
    val expected = toks.filter(_._1 % 10 != 7).flatMap { case (id, tk) =>
      val g = grams(tk)
      val matched = g.count(evalGrams)
      if (matched > 0) Some((id, g.size.toLong, matched.toLong)) else None
    }.sortBy(_._1).toSeq
    val got = Decontam.decontamQuery(spark, sf)
      .select("doc_id", "n_grams", "n_matched")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty, "the clone structure must produce real overlap")
  }

  test("decontam-aware sample = stratified sample minus contaminated ids") {
    import spark.implicits._
    val contam = Decontam.decontamQuery(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val strat = graft.operators.Sampling.stratifiedSample(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    // stratifiedSample draws from ALL docs; the composed query draws
    // from the train corpus only (eval ids excluded) minus contam
    val expected = strat.filter(id => id % 10 != 7 && !contam(id))
    val got = Decontam.decontamSample(spark, sf)
      .select("doc_id").as[Long].collect()
    assert(got.toSet == expected)
    assert(got.sorted.toSeq == got.toSeq, "output must be ordered")
  }

  test("per-source audit conserves corpus and flagged counts") {
    import org.apache.spark.sql.functions._
    val audit = Decontam.queries("txt_decontam_src")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val corpusN = graft.sources.Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 =!= 7).count()
    val flaggedN = Decontam.queries("txt_decontam")(spark, sf).count()
    assert(audit.map(_._2).sum == corpusN, "every corpus doc in exactly one source row")
    assert(audit.map(_._3).sum == flaggedN, "every flagged doc attributed once")
    audit.foreach { case (src, n, c, ppm) =>
      assert(c <= n && ppm == c * 1000000L / n, s"$src: $n $c $ppm")
    }
    assert(audit.exists(_._3 > 0), "the planted clones must contaminate some source")
  }

  test("plan: map-side bloom probe, equi-join only, no cartesian") {
    val plan = Decontam.decontamQuery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"), plan)
  }
}
