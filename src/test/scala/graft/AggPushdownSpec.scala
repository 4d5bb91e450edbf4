package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** `ops_agg_pushdown` must actually BE metadata-only: the DSv2 scan
  * carries the aggregate (`PushedAggregation` in the formatted plan),
  * and the footer-derived numbers equal a plain data-page scan's.
  */
class AggPushdownSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("the aggregate reaches the parquet footer (PushedAggregation)") {
    val df = Relational.queries("ops_agg_pushdown")(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedAggregation: [COUNT(*)"),
      s"aggregate not pushed to the scan:\n$plan")
    assert(plan.contains("MIN(l_orderkey)") && plan.contains("MAX(l_suppkey)"),
      "every min/max must ride the footer read")
  }

  test("footer-path numbers equal the data-page scan bit for bit") {
    val pushed = Relational.queries("ops_agg_pushdown")(spark, sf)
      .collect().head
    val scanned = graft.sources.Tables.lineitem(spark, sf)
      .agg(count(lit(1)), min(col("l_orderkey")), max(col("l_orderkey")),
        min(col("l_partkey")), max(col("l_partkey")),
        min(col("l_suppkey")), max(col("l_suppkey")))
      .collect().head
    assert(pushed.toSeq == scanned.toSeq, s"$pushed vs $scanned")
    assert(pushed.getLong(0) > 0L)
  }
}
