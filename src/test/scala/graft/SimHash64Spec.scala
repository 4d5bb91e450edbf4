package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimHash64.simhash64
import graft.functions.CrossEngine.{portableHash, portableHashLo, tokens}

/** The fused map-side SimHash expression vs the relational chain it
  * replaced (word explode → tf groupBy → 64 conditional sums): the
  * 64-bit fingerprints must be BIT-identical — they feed the Manku
  * blocked join and the DuckDB oracle recomputes them.
  */
class SimHash64Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** The original relational derivation, kept here as the reference. */
  private def viaAggregation = {
    val bitsN = 64
    val aggs = (0 until bitsN).map { b =>
      val h = if (b < 32) "h0" else "h1"
      sum(when(expr(s"(shiftright($h, ${b % 32}) & 1) = 1"), col("tf"))
          .otherwise(-col("tf"))).as(s"s$b")
    }
    val bits = (0 until bitsN).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }
    graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(tokens(col("text"))).as("word"))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .select(col("doc_id"), col("tf"),
              portableHash(col("word")).as("h1"),
              portableHashLo(col("word")).as("h0"))
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), bits.reduce(_ bitwiseOR _).as("simhash"))
  }

  test("fingerprints are bit-identical to the aggregation chain") {
    val viaExpr = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"), simhash64(col("tk")).as("simhash"))
    val ref = viaAggregation
    assert(viaExpr.except(ref).isEmpty && ref.except(viaExpr).isEmpty)
    assert(ref.count() > 0)
  }

  test("stays inside whole-stage codegen") {
    val plan = spark.range(3)
      .selectExpr("array(cast(id as string), 'a') as tk")
      .select(simhash64(col("tk")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
