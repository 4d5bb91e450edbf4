package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Multi-line pins for `dedup_lines` / `dedup_lines_strip`
  * (`Dedup.linesStatsOf` / `linesStripOf`). The driver oracle runs on
  * the synthetic single-line corpus — the degenerate point where every
  * per-doc fraction is 0 or 1 — so this spec plants the cases that
  * corpus can't reach: cross-doc boilerplate under normalization
  * variants, intra-doc repeats, empty and all-empty-normalized lines,
  * an all-duplicated doc, and original-order/original-text rejoin.
  * Expected md5s are computed independently with `MessageDigest`, not
  * Spark's `md5`.
  */
class LineDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  // doc 1: two cross-doc boilerplate lines around one unique line
  // doc 2: the SAME boilerplate under casing/punctuation variants
  //        (normalization must key them together), plus a literally
  //        empty line that must count nowhere
  // doc 3: intra-doc repeat (same line twice in ONE doc is duplicated
  //        even if no other doc has it)
  // doc 4: every line normalizes to empty — excluded from BOTH outputs
  // doc 5: all lines duplicated — kept 0, clean_md5 null
  // doc 6: nothing duplicated; original (not alphabetical) order and
  //        original (not normalized) text must survive the rejoin
  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "Subscribe to our newsletter!\nunique alpha one\nCookie Policy"),
      (2L, "SUBSCRIBE to our Newsletter\nunique beta two\n\n...cookie POLICY..."),
      (3L, "repeated inside\nunique gamma three\nrepeated inside"),
      (4L, "!!!\n---\n. . ."),
      (5L, "Cookie Policy\nSubscribe to our newsletter!"),
      (6L, "zz Last Line!\naa first-line\nmm MIDDLE line")
    ).toDF("doc_id", "text")
  }

  test("linesStats: cross-doc variants, intra-doc repeats, empty lines") {
    val got = Dedup.linesStatsOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(!got.contains(4L), "all-empty-normalized doc must be excluded")
    assert(got(1L) == ((3L, 2L, 0.6667)), s"doc1 ${got(1L)}")
    // the "" line is excluded → 3 non-empty lines, both variants dup
    assert(got(2L) == ((3L, 2L, 0.6667)), s"doc2 ${got(2L)}")
    // intra-doc repeat counts BOTH copies as duplicated
    assert(got(3L) == ((3L, 2L, 0.6667)), s"doc3 ${got(3L)}")
    assert(got(5L) == ((2L, 2L, 1.0)), s"doc5 ${got(5L)}")
    assert(got(6L) == ((3L, 0L, 0.0)), s"doc6 ${got(6L)}")
  }

  test("linesStrip: drops ALL copies, rejoins original text in order") {
    val got = Dedup.linesStripOf(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.getString(3)))))
      .toMap
    assert(!got.contains(4L), "all-empty-normalized doc must be excluded")
    assert(got(1L) == ((3L, 1L, Some(md5hex("unique alpha one")))))
    assert(got(2L) == ((3L, 1L, Some(md5hex("unique beta two")))))
    assert(got(3L) == ((3L, 1L, Some(md5hex("unique gamma three")))))
    // every line duplicated → kept 0, null md5 (not md5("") — nothing
    // survives, there is no cleaned text)
    assert(got(5L) == ((2L, 0L, None)), s"doc5 ${got(5L)}")
    // original order (zz, aa, mm — NOT alphabetical) and original
    // casing/punctuation (not the normalized key text)
    assert(got(6L) == ((3L, 3L,
      Some(md5hex("zz Last Line!\naa first-line\nmm MIDDLE line")))))
  }

  test("linesStats and linesStrip agree: n_lines = dup + kept per doc") {
    val st = Dedup.linesStatsOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val sp = Dedup.linesStripOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(st.keySet == sp.keySet)
    st.foreach { case (id, (n, dup)) =>
      val (n2, kept) = sp(id)
      assert(n == n2 && dup + kept == n,
        s"doc $id: n=$n dup=$dup kept=$kept")
    }
  }
}
