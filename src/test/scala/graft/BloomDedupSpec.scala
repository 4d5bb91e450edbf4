package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomDedup
import graft.sources.Tables

/** Bloom pre-filter contracts: zero false negatives (the property
  * that makes the exact answer exact), measured false-positive rate,
  * and equality with the plain anti-join it accelerates.
  */
class BloomDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)
  private def corpus = docs.filter(col("doc_id") % 3 =!= 0)
  private def incoming = docs.filter(col("doc_id") % 3 === 0)

  test("no false negatives: every truly-seen doc is flagged maybe_seen") {
    import spark.implicits._
    // planted overlap: the sf0.001 %3 split happens to share no
    // content, which would make this test vacuous on real data alone
    val seenTexts = (1 to 50).map(i => s"shared document number $i")
    val newTexts = (1 to 50).map(i => s"fresh document number $i")
    val corpusDf = (seenTexts ++ (1 to 100).map(i => s"corpus only $i"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val incomingDf = (seenTexts ++ newTexts)
      .zipWithIndex.map { case (t, i) => (1000L + i, t) }.toDF("doc_id", "text")
    val flagged = BloomDedup.flagSeen(corpusDf, incomingDf)
    // every one of the 50 truly-seen docs must probe true
    assert(flagged.filter(col("doc_id") < 1050 && !col("maybe_seen")).isEmpty,
      "a document present in the corpus escaped the Bloom filter")
    // and newDocs returns exactly the fresh 50
    val newIds = BloomDedup.newDocs(corpusDf, incomingDf)
      .select("doc_id").as[Long].collect().toSet
    assert(newIds == (1050L until 1100L).toSet)
  }

  test("false-positive rate is small at the configured bits/doc") {
    val flagged = BloomDedup.flagSeen(corpus, incoming)
    val trulySeen = incoming.join(
      corpus.select(col("text")).distinct(), Seq("text"), "left_semi").count()
    val maybeSeen = flagged.filter(col("maybe_seen")).count()
    val n = flagged.count()
    val fp = maybeSeen - trulySeen
    info(s"incoming=$n trulySeen=$trulySeen maybeSeen=$maybeSeen falsePositives=$fp")
    assert(fp <= math.max(2L, n / 20), s"fp rate too high: $fp of $n")
  }

  test("newDocs equals the plain anti-join it prunes") {
    val viaBloom = BloomDedup.newDocs(corpus, incoming).select("doc_id")
    val exact = incoming.join(
      corpus.select(col("text")).distinct(), Seq("text"), "left_anti")
      .select("doc_id")
    assert(viaBloom.except(exact).isEmpty && exact.except(viaBloom).isEmpty)
  }

  test("numBitsFor scales with the corpus and clamps to the broadcast cap") {
    assert(BloomDedup.numBitsFor(0L) == 65536L)
    assert(BloomDedup.numBitsFor(4096L) == 65536L)          // floor
    assert(BloomDedup.numBitsFor(100000L) == 2097152L)      // next pow2 of 1.6M
    assert(BloomDedup.numBitsFor(Long.MaxValue / 32) == (1L << 30)) // cap
    // power of two always
    Seq(1L, 10L, 5000L, 123456L, 10000000L).foreach { n =>
      val b = BloomDedup.numBitsFor(n)
      assert((b & (b - 1)) == 0L, s"$b not a power of two")
      assert(b >= math.min(1L << 30, 16L * n))
    }
  }

  test("bloom functions are registered on the SQL surface") {
    import spark.implicits._
    spark.range(10).selectExpr("cast(id as string) as s")
      .createOrReplaceTempView("bloom_probe")
    val hits = spark.sql(
      """SELECT count(*) FROM bloom_probe
        |WHERE might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(s), 100L, 800L) FROM bloom_probe),
        |  xxhash64(s))""".stripMargin)
      .as[Long].head()
    assert(hits == 10L, "all inserted keys must probe true")
  }
}
