package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{TextPipeline, Sampling}

/** pipe_modern is a composition of independently-verified operators —
  * this spec rebuilds it BY HAND from those operators' own outputs
  * (gopher metrics, PII counts, normalized fingerprints, DSIR scores,
  * split hash) and asserts row-for-row equality, so the composed plan
  * can't silently drift from its parts.
  */
class PipeModernSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def phash(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)

  test("the one-plan composition equals its stages composed by hand") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)

    // stage outputs from the individually-oracle-verified operators
    val gopher = TextPipeline.gopherRulesOf(docs)
      .select($"doc_id", $"n_words", $"mean_word_len", $"symbol_ratio",
              $"alpha_word_frac", $"n_stop_kinds")
      .as[(Long, Long, Double, Double, Double, Long)].collect()
    val piiN = TextPipeline.piiOf(docs).select($"doc_id", $"n_pii")
      .as[(Long, Long)].collect().toMap
    val norm = docs.select($"doc_id",
        md5(graft.functions.NormalizeText.normalize_text($"text").cast("binary")))
      .as[(Long, String)].collect().toMap
    val dsir = Sampling.dsirWeights(spark, sf)
      .select($"doc_id", $"avg_logratio", $"selected")
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    // hand composition: gate (corpus-tuned stops >= 1) -> dedup keep
    // min doc_id per norm fingerprint -> DSIR columns -> split
    val passed = gopher.filter { case (_, nw, ml, sym, al, st) =>
      nw >= 50 && nw <= 100000 && ml >= 3.0 && ml <= 10.0 &&
      sym < 0.1 && al >= 0.8 && st >= 1
    }
    val keep = passed.groupBy(r => norm(r._1)).values.map(_.map(_._1).min).toSet
    val expected = passed.filter(r => keep(r._1)).map { case (id, nw, _, _, _, _) =>
      val (alr, sel) = dsir(id)
      val b = phash(s"split:$id") % 1000
      val split = if (b < 980) "train" else if (b < 990) "val" else "test"
      (id, nw, piiN(id), alr, sel, split)
    }.sortBy(_._1).toSeq

    val got = TextPipeline.pipeModern(spark, sf)
      .as[(Long, Long, Long, Double, Boolean, String)].collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty, "corpus-tuned gate must admit documents")
  }
}
