package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CrossEngine.tokens

/** Property tests for the round-6 fused signature expressions:
  * random unicode-ish text through the full tokenize → expression
  * path, compared against PURE-SCALA references (md5 via
  * java.security, no Spark expressions) — independent of both the
  * relational forms and the DuckDB oracle.
  */
class FusedSignaturePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def randomTexts: Seq[String] = {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val charGen = Gen.frequency(
      (8, Gen.oneOf("the quick brown fox and lazy dog".toSeq)),
      (2, Gen.oneOf('A', 'Z', '0', '9', '\n', '.', ',', '!', 'é', '中', 'ß')))
    val textGen = for {
      n <- Gen.choose(0, 200)
      cs <- Gen.listOfN(n, charGen)
    } yield cs.mkString
    (1L to 80L).map(s => textGen.apply(Gen.Parameters.default, Seed(s)).get)
  }

  /** Reference tokenizer: maximal runs of Unicode letters. */
  private def refTokens(t: String): Vector[String] =
    "[^\\p{L}]+".r.split(t).filter(_.nonEmpty).toVector

  private def md5Head(s: String, off: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(off) & 0xFFL) << 24) | ((d(off + 1) & 0xFFL) << 16) |
      ((d(off + 2) & 0xFFL) << 8) | (d(off + 3) & 0xFFL)
  }

  test("MinHashSlots equals a pure-Scala md5 minhash on random text") {
    import spark.implicits._
    val texts = randomTexts
    val got = texts.toDF("text")
      .select(graft.functions.MinHashSlots.minhash_slots(
        tokens(col("text"))).as("sl"))
      .as[Seq[Long]].collect()
    texts.zip(got).foreach { case (t, sl) =>
      val tk = refTokens(t)
      if (tk.size < 3) assert(sl.isEmpty, s"'$t'")
      else {
        val hs = tk.sliding(3).map(g => md5Head(g.mkString(" "), 0)).toVector
        val want = (0 until 16).map { k =>
          hs.map(h => (h * (2 * k + 1) + (k * k + 7)) % 2147483647L).min
        }
        assert(sl == want, s"'$t'")
      }
    }
  }

  test("SimHash64 equals a pure-Scala fingerprint on random text") {
    import spark.implicits._
    val texts = randomTexts
    val got = texts.toDF("text")
      .select(size(tokens(col("text"))).as("n"),
        graft.functions.SimHash64.simhash64(tokens(col("text"))).as("sh"))
      .as[(Int, Long)].collect()
    texts.zip(got).foreach { case (t, (n, sh)) =>
      val tk = refTokens(t)
      assert(n == tk.size)
      if (tk.nonEmpty) {
        val sums = new Array[Long](64)
        tk.groupBy(identity).foreach { case (w, occ) =>
          val h1 = md5Head(w, 0)
          val h0 = md5Head(w, 4)
          for (b <- 0 until 64) {
            val bit = if (b < 32) (h0 >> b) & 1L else (h1 >> (b - 32)) & 1L
            sums(b) += (if (bit == 1L) occ.size.toLong else -occ.size.toLong)
          }
        }
        val want = (0 until 64).foldLeft(0L) { (acc, b) =>
          if (sums(b) > 0) acc | (1L << b) else acc
        }
        assert(sh == want, s"'$t'")
      }
    }
  }

  test("GramRunStats equals exact string-gram stats on random text") {
    import spark.implicits._
    val texts = randomTexts
    val got = texts.toDF("text")
      .select(graft.functions.GramRunStats.gram_run_stats(
        tokens(col("text"))).as("rs"))
      .select(col("rs.n_grams"), col("rs.n_distinct"), col("rs.max_rep"))
      .as[(Long, Long, Long)].collect()
    texts.zip(got).foreach { case (t, g) =>
      val tk = refTokens(t)
      val want =
        if (tk.size < 3) (0L, 0L, 0L)
        else {
          val grams = tk.sliding(3).map(_.mkString(" ")).toVector
          val counts = grams.groupBy(identity).values.map(_.size)
          (grams.size.toLong, counts.size.toLong, counts.max.toLong)
        }
      assert(g == want, s"'$t'")
    }
  }

  test("DistinctGramHashes per-doc structure on random text") {
    import spark.implicits._
    val texts = randomTexts
    val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), tokens(col("text")).as("tk"))
      .select(col("id"), graft.functions.DistinctGramHashes
        .distinct_gram_hashes(col("tk"), 3))
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    texts.zipWithIndex.foreach { case (t, i) =>
      val tk = refTokens(t)
      val wantN =
        if (tk.size < 3) 0
        else tk.sliding(3).map(_.mkString(" ")).toSet.size
      val rs = rows.getOrElse(i.toLong, Array.empty)
      assert(rs.length == wantN, s"'$t'")
      assert(rs.map(_._2).distinct.length == rs.length, s"dup hashes for '$t'")
      rs.foreach(r => assert(r._3 == wantN.toLong))
    }
  }
}
