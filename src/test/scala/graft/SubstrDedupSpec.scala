package graft

import org.scalatest.funsuite.AnyFunSuite

/** Substring-level exact dedup (Lee et al. 2022): planted-corpus
  * ground truth for [[graft.operators.Dedup.substrSpansOf]] — the
  * hash-keyed distributed scan must find exactly the maximal
  * duplicated ≥13-token regions, across documents and within one.
  *
  * Tokens are letter-only on purpose: the shared tokenizer splits on
  * non-letters, so a digit inside a synthetic token would silently
  * split it and change every planted position.
  */
class SubstrDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // distinct letter-only token: <prefix><aa..zz>
  private def w(prefix: String, i: Int): String =
    prefix + ('a' + i / 26).toChar + ('a' + i % 26).toChar
  private def run(prefix: String, n: Int): String =
    (0 until n).map(w(prefix, _)).mkString(" ")

  private def spansOf(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = spark.createDataset(docs).toDF("doc_id", "text")
    graft.operators.Dedup.substrSpansOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
  }

  // 13 distinct tokens, the exact window width
  private val boiler = run("boiler", 13)

  test("a 13-token region shared by two documents is one maximal span in each") {
    val spans = spansOf(Seq(
      1L -> s"alpha beta gamma $boiler delta epsilon zeta",
      2L -> s"one two $boiler three four five six seven"))
    // doc 1: tokens 4..16; doc 2: tokens 3..15
    assert(spans === Seq((1L, 4L, 16L, 13L), (2L, 3L, 15L, 13L)))
  }

  test("unique documents produce no spans") {
    val docs = (0 until 4).map(i =>
      (i + 1).toLong -> run("uniq" + ('a' + i).toChar, 30))
    assert(spansOf(docs).isEmpty)
  }

  test("overlapping duplicated windows merge into one maximal span") {
    // 20 shared tokens -> 8 duplicated window starts in each doc,
    // consecutive, all folding into a single maximal span of 20
    val long20 = run("sh", 20)
    val spans = spansOf(Seq(
      1L -> s"$long20 taila tailb",
      2L -> s"leada leadb $long20"))
    assert(spans === Seq((1L, 1L, 20L, 20L), (2L, 3L, 22L, 20L)))
  }

  test("a region repeated WITHIN one document is detected") {
    val spans = spansOf(Seq(
      7L -> s"$boiler mida midb midc $boiler"))
    // occurrences at tokens 1..13 and 17..29: starts 1 and 17 differ
    // by 16 > K-1, so two separate maximal spans
    assert(spans === Seq((7L, 1L, 13L, 13L), (7L, 17L, 29L, 13L)))
  }

  test("a 12-token shared region (below K) is invisible") {
    val short12 = run("sub", 12)
    val spans = spansOf(Seq(
      1L -> s"$short12 xa xb xc xd xe",
      2L -> s"ya yb yc yd ye $short12"))
    assert(spans.isEmpty)
  }

  test("three-way duplication still yields one span per document") {
    val spans = spansOf(Seq(
      1L -> s"$boiler aa ab",
      2L -> s"ba $boiler bb",
      3L -> s"ca cb $boiler"))
    assert(spans === Seq(
      (1L, 1L, 13L, 13L), (2L, 2L, 14L, 13L), (3L, 3L, 15L, 13L)))
  }

  test("strip removes exactly the duplicated spans and keeps the rest in order") {
    import spark.implicits._
    val docs = Seq(
      1L -> s"alpha beta gamma $boiler delta epsilon zeta",
      2L -> s"one two $boiler three four five six seven",
      3L -> boiler) // nothing survives
    val df = spark.createDataset(docs).toDF("doc_id", "text")
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val got = graft.operators.Dedup.substrStripOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
                 Option(r.getString(3)))).toSeq
    assert(got === Seq(
      (1L, 19L, 6L, Some(md5("alpha beta gamma delta epsilon zeta"))),
      (2L, 20L, 7L, Some(md5("one two three four five six seven"))),
      (3L, 13L, 0L, None)))
  }
}
