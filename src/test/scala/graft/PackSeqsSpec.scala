package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `txt_pack_seqs` must be the layout a sequential packer would
  * produce: docs abut in doc_id order, window arithmetic matches a
  * plain running total, and window coverage conserves tokens.
  */
class PackSeqsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
  val L = 512L

  test("layout equals a sequential running-total packer") {
    val s = spark
    import s.implicits._
    val ntok = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.BpeTokenizer.subwordCount(col("text")).as("n"))
      .as[(Long, Long)].collect().sortBy(_._1)
    var cum = 0L
    val expected = ntok.map { case (id, n) =>
      val start = cum; cum += n
      val endSeq = if (n > 0) (cum - 1) / L else start / L
      val nSeqs = if (n > 0) endSeq - start / L + 1 else 0L
      (id, n, start / L, start % L, endSeq, nSeqs)
    }.toSeq
    val got = graft.operators.TextPipeline.queries("txt_pack_seqs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // the corpus is big enough that documents actually span windows
    assert(got.exists(_._6 > 1), "no document spans a window boundary")
    // conservation: total tokens == last doc's end position
    assert(got.map(_._2).sum == cum)
  }
}
