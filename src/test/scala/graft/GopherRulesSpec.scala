package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextPipeline

/** Gopher rule-set filter: differential against a plain-Scala
  * reference on the real corpus, plus planted documents that trip
  * each rule branch individually (the synthetic corpus is single-line
  * and symbol-free, so the line-shape and symbol rules only do real
  * work on the planted rows).
  */
class GopherRulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def pr4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  private case class Row(nWords: Long, meanLen: Double, symbol: Double,
                         alpha: Double, bullet: Double, ellipsis: Double,
                         stopKinds: Long, pass: Boolean)

  private def reference(text: String): Option[Row] = {
    val nWords = "\\S+".r.findAllIn(text).length.toLong
    if (nWords == 0) return None
    val nWchars = text.replaceAll("\\s", "").length.toLong
    val nSymbols = text.count(_ == '#').toLong +
      "\\.\\.\\.|…".r.findAllIn(text).length
    val nAlpha = "\\S*\\p{L}\\S*".r.findAllIn(text).length.toLong
    val nLines = text.split("\n", -1).length.toLong
    val nBullet = "(?m)^[ \\t]*[-*•]".r.findAllIn(text).length.toLong
    val nEll = "(?m)(\\.\\.\\.|…)[ \\t]*$".r.findAllIn(text).length.toLong
    val tk = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty).toSet
    val stopKinds = stops.count(tk.contains).toLong
    val meanLen = pr4(nWchars.toDouble / nWords)
    val symbol = pr4(nSymbols.toDouble / nWords)
    val alpha = pr4(nAlpha.toDouble / nWords)
    val bullet = pr4(nBullet.toDouble / nLines)
    val ellipsis = pr4(nEll.toDouble / nLines)
    val pass = nWords >= 50 && nWords <= 100000 &&
      meanLen >= 3.0 && meanLen <= 10.0 && symbol < 0.1 &&
      bullet < 0.9 && ellipsis < 0.3 && alpha >= 0.8 && stopKinds >= 2
    Some(Row(nWords, meanLen, symbol, alpha, bullet, ellipsis, stopKinds, pass))
  }

  private def run(docs: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    TextPipeline.gopherRulesOf(docs)
      .as[(Long, Long, Double, Double, Double, Double, Double, Long, Boolean)]
      .collect()
      .map(r => r._1 -> Row(r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9))
      .toMap
  }

  test("distributed metrics equal the plain-Scala reference on the corpus") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expected = docs.flatMap { case (id, t) => reference(t).map(id -> _) }.toMap
    assert(run(graft.sources.Tables.documents(spark, sf)) === expected)
  }

  test("each rule branch trips on its planted document") {
    import spark.implicits._
    val longGood = (Seq("the", "cat", "sat", "with", "all") ++
      Seq.fill(55)("word")).mkString(" ")             // 60 words, 2+ stops
    val docs = Seq(
      1L -> longGood,                                  // passes everything
      2L -> "- alpha one\n- beta two\n- gamma three",  // bullet lines
      3L -> (("wait... " * 30).trim + " ok\nend here...\nmore..."), // ellipsis lines + symbols
      4L -> (Seq.fill(60)("## ##").mkString(" ")),     // symbol ratio + no alpha
      5L -> "too short to pass the word count with the rest fine",
      6L -> (Seq.fill(30)("12345 67890").mkString(" ")) // numeric words
    ).map { case (i, t) => (i, t) }.toDF("doc_id", "text")
    val got = run(docs)

    assert(got(1L).pass, "doc 1 should pass all rules")
    assert(got(2L).bullet === 1.0 && !got(2L).pass)
    // doc 3: 3 lines, 2 end in "..." -> 0.6667 >= 0.3
    assert(got(3L).ellipsis === pr4(2.0 / 3.0) && !got(3L).pass)
    assert(got(4L).symbol >= 0.1 && got(4L).alpha === 0.0 && !got(4L).pass)
    assert(got(5L).nWords < 50 && !got(5L).pass)
    assert(got(6L).alpha === 0.0 && !got(6L).pass)
    // every planted doc matches the reference arithmetic exactly
    val expected = Seq(1L -> longGood,
      2L -> "- alpha one\n- beta two\n- gamma three",
      3L -> (("wait... " * 30).trim + " ok\nend here...\nmore..."),
      4L -> Seq.fill(60)("## ##").mkString(" "),
      5L -> "too short to pass the word count with the rest fine",
      6L -> Seq.fill(30)("12345 67890").mkString(" "))
      .flatMap { case (id, t) => reference(t).map(id -> _) }.toMap
    assert(got === expected)
  }
}
