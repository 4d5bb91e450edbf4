package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.operators.TextAnalytics
import graft.streaming.ReplicatedLog

/** Tokenizer edge cases (FIXTURES.md §2), sink round-trip (S7/P3),
  * replay source (S9/W1), and the partition-invariance property
  * (SURVEY §5).
  */
class TextAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tokensOf(text: String): Seq[String] = {
    import spark.implicits._
    TextAnalytics.tokenize(Seq(text).toDF("text"))
      .as[String].collect().toSeq
  }

  test("tokenizer edge cases match wc.go semantics (FIXTURES §2)") {
    assert(tokensOf(" 12 ,.! \n") == Seq.empty)
    assert(tokensOf("The the THE") == Seq("The", "the", "THE"))
    assert(tokensOf("abc123def") == Seq("abc", "def"))
    assert(tokensOf("don't") == Seq("don", "t"))
    assert(tokensOf("æsthetics ϰητος חו") == Seq("æsthetics", "ϰητος", "חו"))
    assert(tokensOf("peer-to-peer") == Seq("peer", "to", "peer"))
    assert(tokensOf("") == Seq.empty)
  }

  test("text sink round-trips through readCounts incl. malformed-line tolerance") {
    import spark.implicits._
    val counts = TextAnalytics.wordCount(
      Seq("a b b c c c").toDF("text"))
    val dir = java.nio.file.Files.createTempDirectory("wc").toString
    TextAnalytics.writeCounts(counts, s"$dir/out")
    // corrupt a copy of the sink with an empty + malformed line (P3/P4)
    // (fresh dir: Hadoop's local-FS .crc would reject an in-place edit)
    val part = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.endsWith(".txt")).head
    val lines = scala.io.Source.fromFile(part).getLines().toSeq
    new java.io.File(s"$dir/corrupt").mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/corrupt/data.txt"),
      (lines ++ Seq("", "malformed notanumber")).mkString("\n"))
    val back = TextAnalytics.readCounts(spark, s"$dir/corrupt")
      .as[(String, Long)].collect().toMap
    assert(back == Map("a" -> 1L, "b" -> 2L, "c" -> 3L))
  }

  test("replay source streams sink lines in order (S9/W1)") {
    import spark.implicits._
    val counts = TextAnalytics.wordCount(Seq("x y y z z z").toDF("text"))
    val dir = java.nio.file.Files.createTempDirectory("replay").toString
    TextAnalytics.writeCounts(counts, s"$dir/lines")
    val q = ReplicatedLog.replaySource(spark, s"$dir/lines")
      .writeStream.format("memory").queryName("replay_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("replay_out").select("value").as[String].collect().toSeq
    assert(got.sorted == Seq("x 1", "y 2", "z 3"))
  }

  test("property: word count invariant under partition count (X1/A4)") {
    import spark.implicits._
    // ScalaCheck-generated corpus, fixed seed for reproducibility
    val gen = Gen.listOfN(200, Gen.oneOf("the", "dog", "a", "ϰητος", "spark"))
    val words = gen(Gen.Parameters.default, org.scalacheck.rng.Seed(42L)).get
    val expected = words.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    for (n <- Seq(1, 2, 3, 7, 16)) {
      val got = TextAnalytics.wordCount(words.toDF("text").repartition(n))
        .as[(String, Long)].collect().toMap
      assert(got == expected, s"partition count $n")
    }
  }
}
