package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.BloomDedup

/** Persistent cross-run Bloom state: the sketch round-trips through
  * parquet byte-exactly, incremental per-batch sketches OR-merge to
  * the one-shot corpus sketch bit-for-bit, and probing a persisted
  * sketch flags exactly what the in-plan aggregate flags.
  */
class BloomStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val Bits = 1L << 20 // pinned: merging requires equal params

  private def docs = graft.sources.Tables.documents(spark, sf)
  private def batch1 = docs.filter(col("doc_id") % 2 === 0)
  private def batch2 = docs.filter(col("doc_id") % 2 =!= 0)

  test("two-session incremental merge equals the one-shot sketch byte-for-byte") {
    val oneShot = BloomDedup.corpusSketch(docs, Bits)
    val incremental = BloomDedup.mergeSketches(
      BloomDedup.corpusSketch(batch1, Bits),
      BloomDedup.corpusSketch(batch2, Bits))
    assert(java.util.Arrays.equals(oneShot, incremental))
  }

  test("sketch round-trips through parquet unchanged") {
    val sk = BloomDedup.corpusSketch(batch1, Bits)
    val path = java.nio.file.Files
      .createTempDirectory("bloom_state").resolve("sk").toString
    BloomDedup.saveSketch(spark, path, sk)
    assert(java.util.Arrays.equals(BloomDedup.loadSketch(spark, path), sk))
  }

  test("probing a persisted sketch equals the in-plan aggregate probe") {
    val sk = BloomDedup.corpusSketch(batch1, Bits)
    def flags(df: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
      df.select(col("doc_id"), col("maybe_seen")).collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val persisted = flags(BloomDedup.flagSeenSketch(batch2, sk))
    val inPlan = flags(BloomDedup.flagSeen(batch1, batch2, Bits))
    assert(persisted === inPlan)
    assert(persisted.nonEmpty)
  }

  test("no false negatives across the session boundary") {
    // every batch2 doc whose text also appears in batch1 MUST flag
    val sk = BloomDedup.corpusSketch(batch1, Bits)
    val dup = BloomDedup.flagSeenSketch(batch2, sk)
      .join(batch1.select(col("text")).distinct(), Seq("text"), "left_semi")
    val missed = dup.filter(!col("maybe_seen")).count()
    assert(missed === 0L)
  }

  test("mixed-parameter merges fail loudly") {
    val a = BloomDedup.corpusSketch(batch1, Bits)
    val b = BloomDedup.corpusSketch(batch2, Bits * 2)
    assertThrows[org.apache.spark.util.sketch.IncompatibleMergeException] {
      BloomDedup.mergeSketches(a, b)
    }
  }
}
