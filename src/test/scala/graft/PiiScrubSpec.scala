package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextPipeline

/** PII detection/redaction: differential against a plain-Scala
  * reference (same java.util.regex patterns) on the real corpus plus
  * planted documents carrying every category — the synthetic corpus
  * itself is PII-free, so the planted rows are where the counters and
  * the redaction order do real work.
  */
class PiiScrubSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def reference(text: String): (Seq[Long], String, Long) = {
    val low = text.toLowerCase
    val counts = TextPipeline.PiiPatterns.map { case (_, p) =>
      p.r.findAllIn(low).length.toLong
    }
    val red = TextPipeline.PiiPatterns.foldLeft(low) { case (acc, (_, p)) =>
      acc.replaceAll(p, "<PII>")
    }
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(red.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (counts, md5, counts.sum)
  }

  private def run(docs: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    TextPipeline.piiOf(docs)
      .as[(Long, Long, Long, Long, Long, Long, String, Long)].collect()
      .map(r => r._1 -> ((Seq(r._2, r._3, r._4, r._5, r._6), r._7, r._8)))
      .toMap
  }

  test("real corpus carries zero PII and matches the reference everywhere") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expected = docs.map { case (id, t) => id -> reference(t) }.toMap
    val got = run(graft.sources.Tables.documents(spark, sf))
    assert(got === expected)
    assert(got.values.forall(_._3 == 0L), "synthetic corpus must be PII-free")
  }

  test("each planted category is counted, redacted, and order-stable") {
    import spark.implicits._
    val docs = Seq(
      1L -> "contact Bob.Smith+spam@Example.ORG today",
      2L -> "ssn 123-45-6789 on file",
      3L -> "served from 192.168.001.254 port eighty",
      4L -> "call +1-555-867-5309 or 555 123 4567 now",
      5L -> "card 4111111111111111 charged",
      6L -> "mixed: a@b.io then 10.0.0.1 then 123-45-6789",
      7L -> "clean text with no identifiers at all"
    ).toDF("doc_id", "text")
    val got = run(docs)
    // (email, ssn, ipv4, phone, longnum)
    assert(got(1L)._1 === Seq(1L, 0L, 0L, 0L, 0L))
    assert(got(2L)._1 === Seq(0L, 1L, 0L, 0L, 0L))
    assert(got(3L)._1 === Seq(0L, 0L, 1L, 0L, 0L))
    assert(got(4L)._1 === Seq(0L, 0L, 0L, 2L, 0L))
    assert(got(5L)._1 === Seq(0L, 0L, 0L, 0L, 1L))
    assert(got(6L)._1 === Seq(1L, 1L, 1L, 0L, 0L) && got(6L)._3 === 3L)
    assert(got(7L)._3 === 0L)
    // redaction removed every match (reference recomputes the chain)
    val expected = Seq(
      1L -> "contact Bob.Smith+spam@Example.ORG today",
      2L -> "ssn 123-45-6789 on file",
      3L -> "served from 192.168.001.254 port eighty",
      4L -> "call +1-555-867-5309 or 555 123 4567 now",
      5L -> "card 4111111111111111 charged",
      6L -> "mixed: a@b.io then 10.0.0.1 then 123-45-6789",
      7L -> "clean text with no identifiers at all")
      .map { case (id, t) => id -> reference(t) }.toMap
    assert(got === expected)
  }
}
