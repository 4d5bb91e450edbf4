package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Classifier

/** Pins for the trained quality-classifier gate (`txt_classifier` /
  * `smp_classifier_docs`): real selection behavior on a planted
  * separable corpus (the corpus gate exercises only the arithmetic —
  * synthetic sources are content-uncorrelated), the frozen-model
  * round-trip (score later batches bit-identically), and the
  * one-token-pass plan shape.
  */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  // positives (src0) speak the "clean" vocabulary, negatives (src9)
  // the "boiler" one; probe docs 100/101 carry a NEGATIVE-tier source
  // label, so their CONTENT alone must decide the score sign — the
  // whole point of training a classifier instead of trusting metadata
  private lazy val planted = {
    val s = spark
    import s.implicits._
    ((1L to 20L).map(i => (i, "src0", "clean prose wellformed curated edited " * 4)) ++
     (21L to 40L).map(i => (i, "src9", "boiler spam clickbait garbled junk " * 4)) ++
     Seq((100L, "src9", "clean prose wellformed curated edited clean prose"),
         (101L, "src9", "boiler spam clickbait garbled junk boiler spam")))
      .toDF("doc_id", "source", "text")
  }

  test("separable corpus: content decides the score, not the source label") {
    val got = Classifier.classifierScoresOf(planted)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got(100L)._1 > 0 && got(100L)._2,
      s"clean-content probe should classify HQ: ${got(100L)}")
    assert(got(101L)._1 < 0 && !got(101L)._2,
      s"junk-content probe should classify LQ: ${got(101L)}")
    // and the seed sets themselves separate perfectly
    assert((1L to 20L).forall(got(_)._2) && (21L to 40L).forall(!got(_)._2))
  }

  test("frozen model scores a later batch bit-identically") {
    val s = spark
    import s.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("cls_model").toString
    Classifier.saveModel(docs, path)
    val loaded = Classifier.loadModel(spark, path)
    val full = Classifier.classifierScoresOf(docs).collect().map(_.toSeq).toSeq
    // model round-trip: in-plan == frozen on the same corpus
    val frozen = Classifier.scoreWith(docs, loaded).collect().map(_.toSeq).toSeq
    assert(frozen === full)
    // scoring is stateless per document: a later "batch" (a slice)
    // scored against the frozen model equals the full run's slice
    val slice = Classifier.scoreWith(docs.filter($"doc_id" % 7 === 0), loaded)
      .collect().map(_.toSeq).toSeq
    assert(slice === full.filter(r => r.head.asInstanceOf[Long] % 7 == 0))
  }

  test("all-miss document still scores with the model's kc and pc") {
    val s = spark
    import s.implicits._
    // train on the planted corpus, score a document whose every token
    // hashes only to buckets the model may not have populated — the
    // first cut recovered kc/pc from MATCHED model rows, so a full-miss
    // document scored 0·wi + 0·kc + 0·pc = 0 instead of n·kc + pc
    val path = java.nio.file.Files.createTempDirectory("cls_allmiss").toString
    Classifier.saveModel(planted, path)
    val model = Classifier.loadModel(spark, path)
    val (wi, kc, pc) = Classifier.collectModel(model).get
    // find 3 tokens whose buckets are absent from the trained model
    def pHash(w: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString, 16)
    // letter-only candidates (digits would be split off by the
    // tokenizer, collapsing every candidate to the same token)
    val missTokens = (1 to 10000).iterator
      .map(i => "zz" + i.toString.map(c => ('a' + (c - '0')).toChar))
      .filter(w => !wi.contains(pHash(w) % 256)).take(3).toSeq
    assume(missTokens.size == 3, "corpus hashed every bucket; widen the probe")
    val probe = Seq((7L, missTokens.mkString(" "))).toDF("doc_id", "text")
    val got = Classifier.scoreWith(probe, model).collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 3L * kc + pc,
      s"expected n*kc+pc = ${3L * kc + pc}, got ${got.head.getLong(2)}")
    // and scoreExpr (the streaming gate) agrees exactly
    val expr = probe.select(
      Classifier.scoreExpr(col("text"), wi, kc, pc).as("sc")).collect()
    assert(expr.head.getLong(0) == got.head.getLong(2))
  }

  test("model branches share one exchange (token pass runs once)") {
    val df = Classifier.queries("txt_classifier")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(plan).nonEmpty,
      s"kc branch recomputes the token aggregate instead of reusing its exchange:\n" +
        plan.split("\n").take(40).mkString("\n"))
  }

  test("smp_classifier_docs keeps exactly the budgeted best-scoring docs") {
    val scores = Classifier.queries("txt_classifier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val expect = scores.sortBy { case (id, lo) => (-lo, id) }.take(100)
      .map(_._1).toSeq
    val got = Classifier.queries("smp_classifier_docs")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(got == expect)
  }
}
