package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TokenMembershipCounts.token_membership_counts

/** The map-side token-profile expression vs the explode+aggregate
  * form it replaced in quality/langid/pipe_clean.
  */
class TokenMembershipCountsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val sets = Seq(
    "stop" -> Seq("the", "a", "an", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "en"))

  test("counts match the lower-membership reference on hand cases") {
    import spark.implicits._
    val cases: Seq[Seq[String]] = Seq(
      Seq.empty, Seq("The", "THE", "the"), Seq("la", "unrelated", "EN"),
      Seq("x"), Seq("of", "el", "of", "el"))
    val got = cases.toDF("tk")
      .select(token_membership_counts(col("tk"), sets).as("p"))
      .select(col("p.n_tokens"), col("p.stop"), col("p.es"))
      .as[(Long, Long, Long)].collect()
    cases.zip(got).foreach { case (tk, (n, stop, es)) =>
      assert(n == tk.size.toLong)
      assert(stop == tk.count(t => sets(0)._2.contains(t.toLowerCase)).toLong)
      assert(es == tk.count(t => sets(1)._2.contains(t.toLowerCase)).toLong)
    }
  }

  test("equals the explode+aggregate form across the real corpus") {
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(
        graft.functions.CrossEngine.tokens(col("text"))).as("word"))
    val viaAgg = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(lower(col("word")).isin(sets(0)._2: _*), 1).otherwise(0)).as("stop"),
        sum(when(lower(col("word")).isin(sets(1)._2: _*), 1).otherwise(0)).as("es"))
    val viaExpr = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), token_membership_counts(
        graft.functions.CrossEngine.tokens(col("text")), sets).as("p"))
      .filter(col("p.n_tokens") > 0)
      .select(col("doc_id"), col("p.n_tokens").as("n_tokens"),
        col("p.stop").as("stop"), col("p.es").as("es"))
    assert(viaAgg.except(viaExpr).isEmpty && viaExpr.except(viaAgg).isEmpty)
  }

  test("stays inside whole-stage codegen") {
    val plan = spark.range(3)
      .selectExpr("array(cast(id as string), 'the') as tk")
      .select(token_membership_counts(col("tk"), sets))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
