package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextPipeline

/** Bigram-LM fluency scoring: differential against a plain-Scala
  * reference on the real corpus, plus the semantic contract on a
  * constructed one — documents built from the corpus's common
  * transitions outscore word salad.
  */
class LmScoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def tokenize(text: String): Seq[String] =
    text.split("[^\\p{L}]+").filter(_.nonEmpty).toSeq

  test("distributed scores equal the plain-Scala reference") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val bigrams = docs.flatMap { case (id, t) =>
      tokenize(t).sliding(2).collect { case Seq(a, b) => (id, a, b) }
    }
    val c12 = bigrams.groupBy(x => (x._2, x._3)).view.mapValues(_.length).toMap
    val c1 = bigrams.groupBy(_._2).view.mapValues(_.length).toMap
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      val qs = bs.map { case (_, a, b) =>
        math.floor((math.log(c12((a, b))) - math.log(c1(a))) * 1e6 + 0.5).toLong
      }
      val avg = qs.sum.toDouble / qs.length / 1e6
      id -> (qs.length.toLong, math.floor(avg * 1e4 + 0.5) / 1e4)
    }
    val got = TextPipeline.lmScore(spark, sf)
      .as[(Long, Long, Double)].collect()
      .map { case (id, nb, s) => id -> (nb, s) }.toMap
    assert(got === expected)
  }

  test("common transitions outscore rare transitions over the same vocabulary") {
    import spark.implicits._
    // doc 1 repeats the dominant transition (the→cat); doc 2 uses the
    // SAME words in transitions the corpus almost never makes — its
    // contexts are common (large c1) but its bigrams rare (small c12)
    val docs = Seq(
      (1L, Seq.fill(30)("the cat").flatMap(_.split(" ")).mkString(" ")),
      (2L, Seq.fill(5)("cat cat the the").flatMap(_.split(" ")).mkString(" ")))
      .toDF("doc_id", "text")
    val scores = TextPipeline.lmScoreOf(docs)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(scores(1L) > scores(2L))
  }
}
