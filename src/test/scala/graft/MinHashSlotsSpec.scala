package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MinHashSlots.minhash_slots
import graft.functions.CrossEngine.{portableHash, tokens}

/** The fused map-side MinHash expression vs the relational chain it
  * replaced (shingle explode → portableHash → 16-min aggregation):
  * slot values must be BIT-identical — they are what the DuckDB
  * oracle recomputes and what LSH band joins key on.
  */
class MinHashSlotsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val K = 16
  private val P = 2147483647L

  /** The original relational derivation, kept here as the reference. */
  private def viaAggregation = {
    val docs = graft.sources.Tables.documents(spark, sf)
    val tk = col("tk")
    val sh = docs
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        when(size(tk) >= 3,
          transform(sequence(lit(1), size(tk) - 2),
            i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1),
                           element_at(tk, i + 2))))
          .otherwise(array().cast("array<string>")).as("ngrams"))
      .select(col("doc_id"), explode(col("ngrams")).as("g"))
    val aggs = (0 until K).map { i =>
      min((col("h") * (2 * i + 1) + (i * i + 7)) % P).as(s"mh$i")
    }
    sh.select(col("doc_id"), portableHash(col("g")).as("h"))
      .groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  test("slots are bit-identical to the explode+aggregate chain") {
    val viaExpr = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), minhash_slots(tokens(col("text"))).as("sl"))
      .filter(size(col("sl")) > 0)
      .select(col("doc_id") +: (0 until K).map(i =>
        element_at(col("sl"), i + 1).as(s"mh$i")): _*)
    val ref = viaAggregation
    assert(viaExpr.except(ref).isEmpty && ref.except(viaExpr).isEmpty)
    assert(ref.count() > 0)
  }

  test("null tokens are skipped with their separator (concat_ws parity)") {
    // The relational/oracle form grams via concat_ws, which drops
    // null arguments AND the separator next to them — the fused
    // expression must hash the exact same gram bytes or batch and
    // streaming signatures diverge on containsNull=true arrays.
    import spark.implicits._
    val df = Seq(
      (1, Seq[String]("a", null, "b", "c")),
      (2, Seq[String](null, "x", null, "y", "z")),
      (3, Seq[String]("p", "q", null, "r", "s"))).toDF("id", "tk")
    val tk = col("tk")
    val aggs = (0 until K).map { i =>
      min((col("h") * (2 * i + 1) + (i * i + 7)) % P).as(s"mh$i")
    }
    val rel = df
      .select(col("id"), explode(transform(sequence(lit(1), size(tk) - 2),
        i => concat_ws(" ", element_at(tk, i), element_at(tk, i + 1),
                       element_at(tk, i + 2)))).as("g"))
      .select(col("id"), portableHash(col("g")).as("h"))
      .groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    val viaExpr = df
      .select(col("id"), minhash_slots(col("tk")).as("sl"))
      .select(col("id") +: (0 until K).map(i =>
        element_at(col("sl"), i + 1).as(s"mh$i")): _*)
    assert(viaExpr.except(rel).isEmpty && rel.except(viaExpr).isEmpty)
    assert(rel.count() == 3)
  }

  test("fewer than 3 tokens yields an empty slot array") {
    import spark.implicits._
    val got = Seq("", "one", "two words", "three whole tokens")
      .toDF("text")
      .select(size(minhash_slots(tokens(col("text")))).as("n"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 0, 0, 16))
  }

  test("stays inside whole-stage codegen") {
    val plan = spark.range(3)
      .selectExpr("array(cast(id as string), 'a', 'b', 'c') as tk")
      .select(minhash_slots(col("tk")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
