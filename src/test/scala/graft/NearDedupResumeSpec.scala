package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.NearDedup

/** Durability of the streaming near-dup state: a restarted query
  * must find pairs against documents ingested BEFORE the restart
  * (bucket state restored from the RocksDB checkpoint) and must not
  * re-emit pairs it already delivered.
  */
class NearDedupResumeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  private val base =
    "the quick brown fox jumps over the lazy dog again and again tonight"

  test("near-dup pairs survive a query restart from checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("nddurable").toString
    val in = MemoryStream[(Long, String, Timestamp)]

    def start() = NearDedup.candidatePairs(in.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()

    // run 1: two unrelated docs and one guaranteed pair (punctuation
    // variant of doc 1 — identical token stream, different text)
    val q1 = start()
    try {
      in.addData((1L, base, ts(100)),
                 (2L, "completely different words about query engines", ts(100)))
      q1.processAllAvailable()
      in.addData((3L, base + "!!!", ts(101)))
      q1.processAllAvailable()
    } finally q1.stop()

    // run 2, same checkpoint: a new near-dup of doc 1 must pair
    // against state written before the restart
    val q2 = start()
    try {
      in.addData((4L, base + "???", ts(102)))
      q2.processAllAvailable()
    } finally q2.stop()

    val pairs = spark.read.parquet(s"$dir/out")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    // exactly once each: (1,3) from run 1; (1,4) and (3,4) from run 2
    // — the latter two exist only if run 1's bucket state survived
    assert(pairs.sorted == Seq((1L, 3L), (1L, 4L), (3L, 4L)))
  }
}
