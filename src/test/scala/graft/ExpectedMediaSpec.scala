package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal}
import graft.tools.{ExpectedMedia, IndependentCodecs}

/** Pins for the codec-oracle expected-table machinery: the brute
  * all-pairs Hamming scan must equal the production pigeonhole
  * blocked join EXACTLY on the real gate corpora — brute missing a
  * pair would be an ExpectedMedia bug, the blocked join missing one
  * would be a pigeonhole-completeness bug; either way the oracle
  * gate would go red, so this spec localizes the failure first. Runs
  * over the SAME planted-duplicate payload synthesis the registered
  * queries use (image dHash and audio fingerprint).
  */
class ExpectedMediaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def docIds: Array[Long] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect().sorted
  }

  private def blockedPairs(hashes: Array[(Long, Long)]): Set[(Long, Long, Int)] = {
    val s = spark
    import s.implicits._
    Dedup.hammingPairs64(hashes.toSeq.toDF("doc_id", "simhash"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("brute all-pairs == blocked pigeonhole join on the image corpus") {
    val hashes = docIds.map(id =>
      id -> IndependentCodecs.pngDHash(Multimodal.imagePayloadOf(id)))
    val brute = ExpectedMedia.brutePairs(hashes).toSet
    assert(brute.nonEmpty, "planted duplicates must produce pairs")
    assert(brute === blockedPairs(hashes))
  }

  test("brute all-pairs == blocked pigeonhole join on the audio corpus") {
    val hashes = docIds.map(id =>
      id -> IndependentCodecs.wavFingerprint(Multimodal.audioPayloadOf(id)))
    val brute = ExpectedMedia.brutePairs(hashes).toSet
    assert(brute.nonEmpty)
    assert(brute === blockedPairs(hashes))
  }
}
