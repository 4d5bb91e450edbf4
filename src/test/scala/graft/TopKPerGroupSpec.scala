package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScaleOps
import graft.plans.TopKPerGroupExec
import graft.sources.Tables

/** The custom per-group top-k operator: correctness vs the window
  * form, physical shape (partial below the exchange, final above),
  * and the automatic row_number-filter rewrite.
  */
class TopKPerGroupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** AdaptiveSparkPlanExec hides its wrapped plan from collect(). */
  private def unwrap(p: org.apache.spark.sql.execution.SparkPlan) = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      a.executedPlan
    case other => other
  }

  private def windowReference = {
    // rank() alongside row_number() blocks the rewrite, so this stays
    // on WindowExec — an independent implementation to compare against
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rank", row_number().over(w))
      .withColumn("blk", rank().over(w))
      .filter(col("rank") <= 3).drop("blk")
  }

  test("topKPerKey equals the window row_number plan") {
    val got = ScaleOps.topKPerKey(
      Tables.orders(spark, sf)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      keys = Seq("o_custkey"),
      orderBy = Seq(("o_totalprice", true), ("o_orderkey", false)),
      k = 3)
    val want = windowReference
    assert(got.columns.toSeq === want.columns.toSeq)
    assert(got.count() === want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("physical plan: partial top-k below the exchange, final above") {
    val df = ScaleOps.topKPerKey(
      Tables.orders(spark, sf).select(col("o_custkey"), col("o_orderkey"),
                                      col("o_totalprice")),
      Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
    val plan = unwrap(df.queryExecution.executedPlan)
    val execs = plan.collect { case t: TopKPerGroupExec => t }
    assert(execs.map(_.finalPhase).sorted === Seq(false, true), plan.toString)
    val planStr = plan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    val partialIdx = planStr.indexOf("TopKPerGroup false")
    val finalIdx = planStr.indexOf("TopKPerGroup true")
    val exchangeIdx = planStr.indexOf("Exchange hashpartitioning(o_custkey")
    assert(finalIdx >= 0 && partialIdx >= 0 && exchangeIdx >= 0, planStr)
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx,
      s"expected final < exchange < partial in:\n$planStr")
  }

  test("row_number()<=k window filter is rewritten to TopKPerGroup automatically") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val df = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
    val execs = unwrap(df.queryExecution.executedPlan).collect { case t: TopKPerGroupExec => t }
    assert(execs.nonEmpty, df.queryExecution.executedPlan.toString)
    assert(df.count() === windowReference.count())
    assert(df.except(windowReference).isEmpty)
  }

  test("rewrite leaves non-top-k window shapes alone") {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    // rank() (not row_number) must not be rewritten
    val df = Tables.orders(spark, sf)
      .withColumn("r", rank().over(w)).filter(col("r") <= 3)
    assert(unwrap(df.queryExecution.executedPlan).collect {
      case t: TopKPerGroupExec => t }.isEmpty)
    // global (unpartitioned) row_number must not be rewritten
    val wg = Window.orderBy(col("o_orderkey"))
    val dg = Tables.orders(spark, sf)
      .withColumn("r", row_number().over(wg)).filter(col("r") <= 3)
    assert(unwrap(dg.queryExecution.executedPlan).collect {
      case t: TopKPerGroupExec => t }.isEmpty)
  }

  test("ties, k larger than group, and single-row groups") {
    import spark.implicits._
    val df = Seq(
      ("a", 1, 10), ("a", 2, 10), ("a", 3, 10), ("a", 4, 10),
      ("b", 5, 1),
      ("c", 6, 2), ("c", 7, 1)).toDF("g", "id", "v")
    val got = ScaleOps.topKPerKey(df, Seq("g"), Seq(("v", true), ("id", false)), 3)
      .select("g", "id", "v", "rank").as[(String, Int, Int, Int)]
      .collect().sortBy(t => (t._1, t._4))
    assert(got === Array(
      ("a", 1, 10, 1), ("a", 2, 10, 2), ("a", 3, 10, 3),
      ("b", 5, 1, 1),
      ("c", 6, 2, 1), ("c", 7, 1, 2)))
  }
}
