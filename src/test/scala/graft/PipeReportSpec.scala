package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextPipeline
import graft.sources.Tables

/** pipe_report equals the card recomposed from its component queries
  * (quality counts, gopher passes, PII counts, LM scores) aggregated
  * in plain Scala — the composition can't drift from its parts.
  */
class PipeReportSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("the dataset card equals its components aggregated by hand") {
    val srcOf = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // components (each independently oracle-gated)
    val quality = TextPipeline.quality(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap // doc -> n_tokens
    val stopHits = TextPipeline.quality(spark, sf).collect()
      .map(r => r.getLong(0) ->
        math.floor(r.getDouble(3) * r.getLong(1) + 0.5).toLong).toMap
    val gopher = TextPipeline.gopherRules(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(8)).toMap
    val pii = TextPipeline.pii(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_pii")).toMap
    val lm = TextPipeline.lmScore(spark, sf).collect()
      .map(r => r.getLong(0) ->
        math.floor(r.getDouble(2) * 10000d + 0.5).toLong).toMap

    val got = TextPipeline.pipeReport(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val src = r.getString(0)
      val docs = srcOf.collect { case (d, s) if s == src => d }.toSeq
      assert(r.getLong(1) == docs.size.toLong, s"$src n_docs")
      val nTok = docs.map(d => quality.getOrElse(d, 0L)).sum
      assert(r.getLong(2) == nTok, s"$src n_tokens")
      val nStop = docs.map(d => stopHits.getOrElse(d, 0L)).sum
      assert(r.getLong(3) == nStop * 10000 / nTok, s"$src stop_x10k")
      assert(r.getLong(4) == docs.count(d => gopher.getOrElse(d, false)).toLong,
        s"$src n_gopher_pass")
      assert(r.getLong(5) == docs.map(d => pii.getOrElse(d, 0L)).sum, s"$src n_pii")
      val lmq = docs.flatMap(lm.get)
      assert(r.getLong(6) ==
        math.floor(lmq.sum.toDouble / lmq.size).toLong, s"$src lm_mean_x10k")
    }
  }
}
