package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.DotProduct.dot_product

/** The codegen'd DotProduct expression vs the interpreted fold. */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("matches the zip_with/aggregate fold bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val got = df.select(
      dot_product($"a", $"b").as("fast"),
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).as("slow"))
      .as[(Double, Double)].collect()
    got.foreach { case (fast, slow) => assert(fast == slow) }
  }

  test("participates in whole-stage codegen (no interpreted fallback)") {
    import spark.implicits._
    // non-foldable source, else the optimizer folds the whole thing
    // into a LocalTableScan before any codegen happens
    val df = spark.range(4)
      .select(array($"id".cast("double"), lit(2.0)).as("a"),
              array(lit(3.0), lit(4.0)).as("b"))
      .select(dot_product($"a", $"b").as("d"))
    // "*(1) Project ..." — the asterisk marks whole-stage-codegen stages
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.as[Double].collect().toSeq == Seq(8.0, 11.0, 14.0, 17.0))
  }
}
