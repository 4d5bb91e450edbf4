package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CrossEngine.tokens
import graft.functions.WordNGrams.word_ngrams

/** The custom Generator (UDTF form) must emit exactly the shipped
  * array-composition shingles — distinct 3-grams per document —
  * making the two plan shapes interchangeable.
  */
class WordNGramsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def arrayForm = graft.operators.Dedup.shingles(spark, sf)

  private def generatorForm = {
    graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), word_ngrams(col("tk"), 3).as("g"))
  }

  test("generator output equals the array+explode composition") {
    val a = arrayForm.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val g = generatorForm.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(g === a)
    assert(a.nonEmpty)
  }

  test("short and empty token lists produce no shingles") {
    import spark.implicits._
    val df = Seq((1L, "one two"), (2L, ""), (3L, "a b c")).toDF("doc_id", "text")
      .select(col("doc_id"), word_ngrams(tokens(col("text")), 3).as("g"))
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ===
           Seq((3L, "a b c")))
  }

  test("duplicate shingles within a document are emitted once") {
    import spark.implicits._
    val df = Seq((1L, "x y x y x y")).toDF("doc_id", "text")
      .select(col("doc_id"), word_ngrams(tokens(col("text")), 3).as("g"))
    assert(df.collect().map(_.getString(1)).sorted.toSeq === Seq("x y x", "y x y"))
  }
}
