package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.ContentDedup

case class Doc(doc_id: Long, text: String, ts: Timestamp)

/** Streaming twin of exact dedup: first occurrence survives, content
  * duplicates are dropped within and across micro-batches, and the
  * result agrees with the batch groupBy(md5) form on the same data.
  */
class ContentDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("content duplicates drop within and across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Doc]
    val q = ContentDedup.firstSeen(in.toDF())
      .writeStream.format("memory").queryName("cd_out")
      .outputMode("append").start()
    try {
      in.addData(Doc(1, "alpha", ts(100)), Doc(2, "beta", ts(100)),
                 Doc(3, "alpha", ts(101)))          // in-batch dup
      q.processAllAvailable()
      in.addData(Doc(4, "beta", ts(102)),           // cross-batch dup
                 Doc(5, "gamma", ts(102)))
      q.processAllAvailable()
      val kept = spark.table("cd_out").select("doc_id")
        .as[Long].collect().sorted.toSeq
      assert(kept === Seq(1L, 2L, 5L))

      // agreement with the batch twin on the same rows
      val batch = Seq(Doc(1, "alpha", ts(100)), Doc(2, "beta", ts(100)),
                      Doc(3, "alpha", ts(101)), Doc(4, "beta", ts(102)),
                      Doc(5, "gamma", ts(102))).toDF()
        .groupBy(org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.col("text").cast("binary")))
        .agg(org.apache.spark.sql.functions.min("doc_id").as("doc_id"))
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept === batch)
    } finally q.stop()
  }
}
