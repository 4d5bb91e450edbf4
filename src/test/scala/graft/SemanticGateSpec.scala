package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingIngest

/** The live semantic-decontamination gate must EQUAL the batch
  * report: a document kept/dropped by `semanticGate` is exactly a
  * document whose `smp_decontam_sem` max_cos_x1e6 clears/reaches the
  * same threshold — the per-eval cosine arithmetic and rounding
  * chain are shared term by term, and max commutes with the
  * monotone rounding, so the equality is exact, not approximate.
  */
class SemanticGateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("streamed gate equals the batch report filtered at the threshold") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the corpus split the batch report uses: evals = vec_id % 50 == 0
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val evals = emb.filter(col("vec_id") % 50 === 0)
    val docs = emb.filter(col("vec_id") % 50 =!= 0)
      .as[(Long, Array[Double])].collect()

    // a LOW threshold so the gate actually drops documents on the
    // near-isotropic gate corpus (max pairwise cos ~0.5)
    val threshold = 400000L
    val report = graft.operators.Similarity.queries("smp_decontam_sem")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expectKept = docs.map(_._1).filter(id => report(id) < threshold).toSet
    assert(expectKept.nonEmpty && expectKept.size < docs.length,
      s"threshold must split the corpus: kept ${expectKept.size} of ${docs.length}")

    val in = MemoryStream[(Long, Array[Double], Timestamp)]
    val q = StreamingIngest.semanticGate(
        in.toDF().toDF("doc_id", "embedding", "ts"), evals, threshold)
      .writeStream.format("memory").queryName("semgate_out")
      .outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(docs.length / 2)
      in.addData(a.map { case (id, v) => (id, v, ts(100L)) }.toSeq)
      q.processAllAvailable()
      in.addData(b.map { case (id, v) => (id, v, ts(101L)) }.toSeq)
      q.processAllAvailable()
      val kept = spark.table("semgate_out")
        .select(col("doc_id")).as[Long].collect().toSet
      assert(kept == expectKept,
        s"stream-only ${kept -- expectKept} batch-only ${(expectKept -- kept).take(5)}")
    } finally q.stop()
  }

  test("an embedding-identical eval copy is dropped; zero-norm passes") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evv = Array.tabulate(64)(d => math.sin(d * 1.13) + 1.5)
    val far = Array.tabulate(64)(d => if (d % 2 == 0) 1.0 else -1.0)
    val evals = Seq((0L, evv)).toDF("vec_id", "embedding")
    val in = MemoryStream[(Long, Array[Double], Timestamp)]
    val q = StreamingIngest.semanticGate(
        in.toDF().toDF("doc_id", "embedding", "ts"), evals, 950000L)
      .writeStream.format("memory").queryName("semgate_planted")
      .outputMode("append").start()
    try {
      in.addData(Seq(
        (1L, evv.map(_ * 3.0), ts(100L)),     // scaled copy: cos exactly 1
        (2L, far, ts(100L)),                  // near-orthogonal: kept
        (3L, Array.fill(64)(0.0), ts(100L)))) // zero-norm: passes
      q.processAllAvailable()
      val kept = spark.table("semgate_planted")
        .select(col("doc_id")).as[Long].collect().toSet
      assert(kept == Set(2L, 3L), s"got $kept")
    } finally q.stop()
  }
}
