package graft

import java.security.MessageDigest
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextPipeline

/** Pins for content-defined chunking: exact agreement with a
  * plain-Scala recompute of the mask rule, and the property the
  * operator exists for — a prefix insertion re-synchronizes after one
  * chunk, leaving every downstream chunk md5 identical (fixed windows
  * shift everywhere and share nothing).
  */
class CdcChunkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** portableHash: first 8 md5 hex digits as a long. */
  private def ph(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  /** Plain-Scala reference chunker. */
  private def refChunks(toks: Seq[String]): Seq[(Long, Long, Long, String)] = {
    val cuts = (2 until toks.length).filter { i => // 0-based gram end
      ph(s"${toks(i - 2)} ${toks(i - 1)} ${toks(i)}") % 64 == 0
    }.map(_ + 1).toSet // cut AFTER 1-based position i+1
    val out = Seq.newBuilder[(Long, Long, Long, String)]
    var seq = 1L; var start = 1; var buf = List.newBuilder[String]
    (1 to toks.length).foreach { p =>
      buf += toks(p - 1)
      if (cuts.contains(p) || p == toks.length) {
        out += ((seq, start.toLong, (p - start + 1).toLong,
          md5hex(buf.result().mkString(" "))))
        seq += 1; start = p + 1; buf = List.newBuilder[String]
      }
    }
    out.result()
  }

  // seeded token stream with enough entropy to land several 1/64 cuts
  // (letters only — the tokenizer drops digits, so "w123" would
  // collapse every token to "w" and no gram would ever cut)
  private def toks(seed: Int, n: Int): Seq[String] = {
    val r = new scala.util.Random(seed)
    Seq.fill(n)((1 to 4).map(_ => ('a' + r.nextInt(26)).toChar).mkString)
  }

  private def run(docs: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    TextPipeline.chunkCdcOf(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
  }

  test("chunks equal the plain-Scala mask-rule recompute") {
    val t = toks(7, 400)
    val got = run(Seq((1L, t.mkString(" "))))
      .map { case (_, seq, st, n, h) => (seq, st, n, h) }
    val exp = refChunks(t)
    assert(exp.length > 2, s"seeded stream must produce several chunks")
    assert(got.toSeq == exp)
  }

  test("a prefix insertion leaves every downstream chunk md5 unchanged") {
    val shared = toks(11, 400)
    val a = shared
    val b = toks(99, 17) ++ shared // 17 inserted tokens at the top
    val rows = run(Seq((1L, a.mkString(" ")), (2L, b.mkString(" "))))
    val ha = rows.filter(_._1 == 1L).map(_._5).toSet
    val hb = rows.filter(_._1 == 2L).map(_._5).toSet
    val sharedChunks = ha intersect hb
    // all chunks of doc 1 except (at most) its first must reappear in
    // doc 2 verbatim — CDC re-synchronized right after the insertion
    assert(ha.size > 2, "doc must split into several chunks")
    assert(sharedChunks.size >= ha.size - 1,
      s"expected resync: ${sharedChunks.size} shared of ${ha.size}")
  }

  test("chunk dedup counts offset-shifted shared regions as duplicated") {
    val s = spark
    import s.implicits._
    val shared = toks(11, 400)
    val docs = Seq(
      (1L, shared.mkString(" ")),
      (2L, (toks(99, 17) ++ shared).mkString(" ")), // same region, shifted
      (3L, toks(55, 120).mkString(" ")))            // unrelated
    val got = TextPipeline.dedupCdcChunksOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // docs 1 and 2 share every chunk except (at most) doc 2's head
    val (n1, d1, _) = got(1L)
    val (n2, d2, _) = got(2L)
    assert(d1 >= n1 - 1 && d1 > 2, s"doc1 $d1/$n1 dup chunks")
    assert(d2 >= n2 - 2, s"doc2 $d2/$n2 dup chunks")
    assert(got(3L)._2 == 0L && got(3L)._3 == 0.0, "unrelated doc clean")
  }

  test("single-token and empty documents behave") {
    val rows = run(Seq((1L, "hello"), (2L, "")))
    assert(rows.map(_._1).toSet == Set(1L)) // empty doc emits nothing
    val r = rows.head
    assert(r._2 == 1L && r._3 == 1L && r._4 == 1L && r._5 == md5hex("hello"))
  }
}
