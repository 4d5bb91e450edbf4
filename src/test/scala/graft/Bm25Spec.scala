package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextPipeline

/** Pins for BM25: exact score equality (post-pround) against a
  * plain-Scala recompute of the Robertson/Okapi formula on planted
  * documents with hand-countable tf/dl, case-fold + punctuation
  * tokenizer behavior, zero-hit docs, and the desc/doc_id ordering.
  */
class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // terms are ("hash", "merge", "window") — planted tf per doc:
  //   doc 1: tf=(2,1,0) dl=4   doc 2: tf=(0,0,1) dl=1
  //   doc 3: tf=(0,0,0) dl=2   doc 4: tf=(1,1,1) dl=3 (folded/punct)
  private val docs = Seq(
    (1L, "hash hash merge foo"),
    (2L, "window"),
    (3L, "foo bar"),
    (4L, "Hash, MERGE window!"))

  private def planted = {
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "text")
  }

  /** Independent recompute with the documented formula. */
  private def refScore(tf: Seq[Long], dl: Long, n: Long, df: Seq[Long],
                       sumDl: Long): Double = {
    val avgdl = sumDl.toDouble / n
    tf.indices.map { i =>
      val idf = math.log(1.0 + (n - df(i) + 0.5) / (df(i) + 0.5))
      idf * (tf(i) * 2.2) / (tf(i) + 1.2 * (0.25 + 0.75 * dl / avgdl))
    }.sum
  }

  private def pround6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("scores equal the plain-Scala BM25 recompute on planted docs") {
    val tf = Map(1L -> Seq(2L, 1L, 0L), 2L -> Seq(0L, 0L, 1L),
                 3L -> Seq(0L, 0L, 0L), 4L -> Seq(1L, 1L, 1L))
    val dl = Map(1L -> 4L, 2L -> 1L, 3L -> 2L, 4L -> 3L)
    val df = Seq(2L, 2L, 2L) // each term appears in exactly 2 docs
    val got = TextPipeline.bm25Of(planted).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    docs.foreach { case (id, _) =>
      val (gdl, ghit, gscore) = got(id)
      assert(gdl == dl(id), s"dl of doc $id")
      assert(ghit == tf(id).count(_ > 0).toLong, s"n_hit of doc $id")
      assert(gscore == pround6(refScore(tf(id), dl(id), 4L, df, 10L)),
        s"score of doc $id")
    }
  }

  test("zero-hit documents score exactly 0 and rank last by doc_id") {
    val rows = TextPipeline.bm25Of(planted).collect()
    val doc3 = rows.find(_.getLong(0) == 3L).get
    assert(doc3.getLong(2) == 0L && doc3.getDouble(3) == 0.0)
    assert(rows.last.getLong(0) == 3L) // unique zero score sorts last
    // ordering is score desc then doc_id asc
    val scores = rows.map(r => (-r.getDouble(3), r.getLong(0))).toSeq
    assert(scores == scores.sorted)
  }
}
