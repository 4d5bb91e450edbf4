package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextPipeline

/** Pins for `txt_pmi` (TextPipeline.pmiOf): a planted corpus with a
  * known collocation, recomputed independently in plain Scala with
  * `sliding(2)` (not the zip-with-tail plan under test). The planted
  * shape forces the two correctness traps: a token that appears ONLY
  * doc-finally must still count in the unigram marginals (they are
  * NOT derivable from pair counts), and bigrams must never span a
  * document boundary.
  */
class PmiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty).toSeq

  // "New York" is the collocation (5 adjacent hits, case variants);
  // every doc starts with "alpha" and ends with "omega", so an
  // implementation that pairs across document boundaries would mint
  // an (omega, alpha) bigram with count 3 — over the noise floor and
  // visible in the full-equality compare. "omega" occurring ONLY
  // doc-finally also pins the unigram marginals (a doc-final token
  // has no pair row, so marginals are not derivable from pair counts).
  private val texts = Seq(
    "alpha New York is big. New York is loud. we visit omega",
    "alpha in new york or NEW YORK the filler words go on and on omega",
    "alpha filler words go on and on and on again omega",
    "alpha york here; more filler words new york go on and on omega",
  )

  test("pmiOf matches a plain-Scala sliding-window recompute") {
    val s = spark
    import s.implicits._
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

    val toks = texts.map(tokenize)
    val pairs = toks.flatMap(_.sliding(2).collect { case Seq(a, b) => (a, b) })
    val uni = toks.flatten.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val nTok = toks.map(_.size).sum.toDouble
    def pround(x: Double, n: Int): Double = {
      val p = math.pow(10, n); math.floor(x * p + 0.5) / p
    }
    val expected = pairs.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= 3)
      .map { case ((w1, w2), cxy) =>
        val pmi = math.log(cxy * nTok / (uni(w1) * uni(w2)))
        (w1, w2, cxy, uni(w1), uni(w2), pmi)
      }
      .toSeq
      .sortBy { case (w1, w2, _, _, _, pmi) => (-pround(pmi, 6), w1, w2) }
      .take(20)
      .map { case (w1, w2, cxy, cx, cy, pmi) => (w1, w2, cxy, cx, cy, pround(pmi, 4)) }

    val got = TextPipeline.pmiOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getDouble(5))).toSeq
    assert(got == expected, s"\ngot      $got\nexpected $expected")

    // the planted pins actually bit: the collocation surfaced, omega's
    // doc-final occurrences are in its marginal, and no (omega, alpha)
    // boundary bigram exists despite 3 adjacent doc junctions
    assert(got.exists(r => r._1 == "new" && r._2 == "york"))
    assert(uni("omega") == 4L)
    assert(!got.exists(r => r._1 == "omega"),
      "a boundary-spanning build would mint (omega, alpha) with c_xy=3")
  }

  test("txt_pmi runs on the real corpus and respects the noise floor") {
    val df = TextPipeline.pmi(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_.getLong(2) >= 3), "c_xy >= 3 floor")
    // ranking is descending on the 6dp-rounded pmi
    val pmis = rows.map(_.getDouble(5))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b - 1e-4 })
  }
}
