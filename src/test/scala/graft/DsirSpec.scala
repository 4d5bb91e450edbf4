package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

/** DSIR importance weights: differential against a plain-Scala
  * reference on the real corpus, plus the selection semantics on a
  * planted bimodal corpus — documents made of target-language tokens
  * must be selected, raw-only documents must not. (The synthetic
  * corpus's lang column is content-uncorrelated, so the driver gate
  * exercises the arithmetic near weight 0; the planted corpus is
  * where the sign does real work.)
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private val B = 64

  private def tokenize(text: String): Seq[String] =
    text.split("[^\\p{L}]+").filter(_.nonEmpty).toSeq

  private def phash(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString, 16)

  private def pr4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

  private def reference(docs: Seq[(Long, String, String)])
      : Map[Long, (Long, Double, Boolean)] = {
    val toks = docs.flatMap { case (id, lang, t) =>
      tokenize(t).map(w => (id, lang, phash(w) % B))
    }
    val cr = toks.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val ct = toks.filter(_._2 == "en").groupBy(_._3)
      .view.mapValues(_.size.toLong).toMap
    val qi = cr.map { case (b, c) =>
      b -> math.floor((math.log(ct.getOrElse(b, 0L) + 1.0) -
        math.log(c + 1.0)) * 1e6 + 0.5).toLong
    }
    val r = toks.size.toLong
    val t = toks.count(_._2 == "en").toLong
    val kc = math.floor((math.log(r + B.toDouble) -
      math.log(t + B.toDouble)) * 1e6 + 0.5).toLong
    toks.groupBy(_._1).map { case (id, ts) =>
      val n = ts.size.toLong
      val sq = ts.map(x => qi(x._3)).sum
      val avg = pr4((sq + n * kc).toDouble / n / 1e6)
      id -> (n, avg, avg > 0.0)
    }
  }

  test("distributed weights equal the plain-Scala reference") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"text").as[(Long, String, String)].collect()
    val expected = reference(docs.toSeq)
    val got = Sampling.dsirWeights(spark, sf)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got === expected)
  }

  test("persisted model scores bit-identically; incremental slices compose exactly") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("dsir_model").toString
    Sampling.saveDsirModel(docs, s"$dir/m")
    val loaded = Sampling.loadDsirModel(spark, s"$dir/m")
    // model is tiny and self-describing: one row per populated bucket
    // (≤ 64 — the sf0.001 vocabulary hashes into ~26 of them) with
    // the corpus constant kc identical on every row
    assert(loaded.count() <= 64 && loaded.select($"kc").distinct().count() === 1)
    val full = Sampling.dsirWeights(spark, sf).collect().map(_.toSeq).toSeq
    val viaLoaded = Sampling.dsirScoreWith(docs, loaded)
      .collect().map(_.toSeq).toSeq
    assert(viaLoaded === full, "persisted-model scoring differs from in-plan model")
    // scoring is stateless per document: a slice scored against the
    // frozen model equals the full scoring restricted to the slice
    val slice = Sampling.dsirScoreWith(docs.filter($"doc_id" % 7 === 0), loaded)
      .collect().map(_.toSeq).toSeq
    assert(slice === full.filter(r => r.head.asInstanceOf[Long] % 7 == 0))
  }

  test("the model's bucket and constant branches share one exchange (token pass runs once)") {
    val df = Sampling.dsirWeights(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(plan).nonEmpty,
      s"kc branch recomputes the token aggregate instead of reusing its exchange:\n" +
        plan.split("\n").take(40).mkString("\n"))
  }

  test("target-like documents are selected, raw-only ones are not") {
    import spark.implicits._
    // target (en) docs speak one vocabulary, raw (xx) docs another;
    // the probe docs carry no lang label weight themselves — their
    // CONTENT decides the sign of the importance weight
    val corpus = (1L to 20L).map(i => (i, "en", "alpha beta gamma delta " * 5)) ++
      (21L to 40L).map(i => (i, "xx", "omega sigma theta lambda " * 5)) ++
      Seq((100L, "xx", "alpha beta gamma delta alpha beta"), // target-like content
          (101L, "en", "omega sigma theta lambda omega"))    // raw-only content
    val df = corpus.toDF("doc_id", "lang", "text")
    val got = Sampling.dsirWeightsOf(df)
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(got(100L)._2, "target-vocabulary doc must be selected")
    assert(!got(101L)._2, "raw-vocabulary doc must not be selected")
    assert(got(100L)._1 > got(101L)._1)
    // and the whole planted corpus matches the reference arithmetic
    val expected = reference(corpus).map { case (id, (n, a, s)) => id -> (a, s) }
    assert(got === expected)
  }
}
