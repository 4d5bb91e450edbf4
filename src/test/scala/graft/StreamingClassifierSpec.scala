package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier
import graft.streaming.StreamingIngest

/** Pins for the live learned-quality gate: the embedded map-side
  * score expression is bit-identical to the batch `txt_classifier`
  * arithmetic, and the streaming gate admits exactly the documents
  * the batch query marks HQ.
  */
class StreamingClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("map-side score expression equals the batch scores on the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val Some((wi, kc, pc)) = Classifier.collectModel(
      graft.operators.Classifier.loadModel(spark, {
        val p = java.nio.file.Files.createTempDirectory("cls_gate").toString
        Classifier.saveModel(docs, p); p
      }))
    val mapSide = docs
      .select(col("doc_id"), Classifier.scoreExpr(col("text"), wi, kc, pc)
        .as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = Classifier.classifierScoresOf(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // batch omits zero-token docs; every doc it scores must match
    assert(batch.nonEmpty)
    batch.foreach { case (id, s) =>
      assert(mapSide(id) == s, s"doc $id: map-side ${mapSide(id)} vs batch $s")
    }
  }

  test("streaming gate admits exactly the batch-HQ documents") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    // separable planted corpus (the ClassifierSpec setup): model
    // trained batch-side, gate applied to a live stream of probes
    val train = ((1L to 20L).map(i => (i, "src0", "clean prose wellformed curated edited " * 4)) ++
      (21L to 40L).map(i => (i, "src9", "boiler spam clickbait garbled junk " * 4)))
      .toDF("doc_id", "source", "text")
    val probes = Seq(
      (100L, "clean prose wellformed curated edited clean prose"),
      (101L, "boiler spam clickbait garbled junk boiler spam"),
      (102L, "clean curated edited prose wellformed edited"),
      (103L, ""))
    val model = graft.operators.Classifier.loadModel(spark, {
      val p = java.nio.file.Files.createTempDirectory("cls_gate2").toString
      Classifier.saveModel(train, p); p
    })

    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingIngest.classifierGate(
        in.toDF().toDF("doc_id", "text", "ts"), model)
      .writeStream.format("memory").queryName("cls_gate_out")
      .outputMode("append").start()
    try {
      in.addData(probes.map { case (id, t) =>
        (id, t, new Timestamp(86400000L)) })
      q.processAllAvailable()
      val admitted = spark.table("cls_gate_out")
        .select("doc_id").as[Long].collect().toSet
      assert(admitted == Set(100L, 102L),
        s"gate admitted $admitted; clean-content probes are 100 and 102")
    } finally q.stop()
  }
}
