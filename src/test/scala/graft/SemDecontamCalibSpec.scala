package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Classifier, Similarity}

/** Pins for the round-12 audit queries: `smp_decontam_sem` (nearest
  * eval-set embedding per corpus doc — the semantic decontamination
  * surface) against a plain-Scala argmax recompute with deterministic
  * ties, and `txt_classifier_calib` (reliability buckets) against a
  * driver-side recompute from the scored stream.
  */
class SemDecontamCalibSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("smp_decontam_sem equals a plain-Scala nearest-eval argmax") {
    val s = spark
    import s.implicits._
    val vecs = graft.sources.Tables.embeddings(s, sf)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Double])].collect().toMap
    val evals = vecs.filter(_._1 % 50 == 0)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      d / math.sqrt(na) / math.sqrt(nb)
    }
    def micro(x: Double): Long = {
      // pround(x, 6) then micro-integerize, mirroring the operator
      val p = math.floor(x * 1e6 + 0.5) / 1e6
      math.floor(p * 1e6 + 0.5).toLong
    }
    val expected = vecs.filter(_._1 % 50 != 0).map { case (id, v) =>
      val best = evals.toSeq
        .map { case (eid, ev) => (micro(cos(v, ev)), eid) }
        .maxBy { case (m, eid) => (m, -eid) }
      (id, best._2, best._1)
    }.toSet
    val got = Similarity.queries("smp_decontam_sem")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"only-got ${got -- expected}\nonly-expected ${expected -- got}")
    assert(got.nonEmpty)
  }

  test("smp_decontam_sem ties resolve to the lowest eval id (packed argmax)") {
    // two byte-identical eval vectors (ids 0 and 50) → every doc's
    // cosine to them is EQUAL; the winner must be id 0
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("semdc").toString
    val base = Array.tabulate(64)(i => (i % 7 + 1).toDouble)
    val other = Array.tabulate(64)(i => ((i * 3) % 5 + 1).toDouble)
    val rows = Seq(
      (0L, base, 0L), (50L, base, 0L),      // identical evals
      (1L, other, 0L), (2L, base.map(_ * 2.0), 0L))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("smp_decontam_sem")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(2L)._1 == 0L, s"tie must pick eval 0, got ${got(2L)}")
    assert(got(2L)._2 == 1000000L, "scaled copy has cosine exactly 1")
    assert(got(1L)._1 == 0L && got(1L)._2 < 1000000L)
  }

  test("smp_decontam_sem_ivf is dominated by brute and catches every high-cos doc") {
    val brute = Similarity.queries("smp_decontam_sem")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ivf = Similarity.queries("smp_decontam_sem_ivf")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ivf.nonEmpty)
    // the pruned report never claims MORE similarity than the exact one,
    // and only ever reports docs the brute form reports
    ivf.foreach { case (doc, (_, cos)) =>
      assert(brute.contains(doc), s"doc $doc absent from brute report")
      assert(cos <= brute(doc)._2,
        s"doc $doc: ivf cos $cos exceeds brute ${brute(doc)._2}")
    }
    // recall of the contamination screen at a high-similarity threshold:
    // every doc the exact screen would flag at >= 0.95 must be flagged
    // at the same threshold by the pruned screen (measured 1.0 on the
    // gate corpus; the planted exact-copy argument makes cos==1 certain)
    val thresh = 950000L
    val flaggedBrute = brute.collect { case (d, (_, c)) if c >= thresh => d }.toSet
    val flaggedIvf = ivf.collect { case (d, (_, c)) if c >= thresh => d }.toSet
    assert((flaggedBrute -- flaggedIvf).isEmpty,
      s"pruned screen missed high-cos docs: ${(flaggedBrute -- flaggedIvf).take(5)}")
  }

  test("smp_decontam_sem_ivf always catches an embedding-identical eval copy") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("semdcivf").toString
    // 200 spread-out vectors so several coarse lists exist; ids
    // 0/50/100/150 are the eval slice (mod 50), and doc 73 is
    // byte-identical to eval 150: identical vectors rank centroids
    // identically, so 73's top-1 probed list IS 150's list and the
    // copy is caught at any geometry.
    val fixed = (0L until 200L).map { i =>
      val base = Array.tabulate(64)(d => math.sin(i * 0.37 + d * 1.13))
      if (i == 73L) (i, Array.tabulate(64)(d => math.sin(150 * 0.37 + d * 1.13)), 0L)
      else (i, base, 0L)
    }
    fixed.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.queries("smp_decontam_sem_ivf")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.contains(73L), "the planted eval copy must be reported")
    assert(got(73L) == (150L, 1000000L),
      s"planted copy must report eval 150 at cos 1.0, got ${got(73L)}")
  }

  test("smp_cluster_temp equals a driver recompute over the IVF strata") {
    val s = spark
    import s.implicits._
    // independent strata source: the registered ann_ivf_lists surface
    val cidOf = Similarity.queries("ann_ivf_lists")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ntokOf = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.CrossEngine.tokens(col("text"))).cast("long"))
      .as[(Long, Long)].collect().toMap
    val perC = ntokOf.toSeq.collect { case (id, nt) if cidOf.contains(id) =>
      (cidOf(id), nt) }.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).sum }
    val grand = perC.values.sum.toDouble
    def fl(x: Double): Long = math.floor(x + 0.5).toLong
    val pPpm = perC.map { case (c, t) => c -> fl(t / grand * 1e6) }
    val sTemp = perC.map { case (c, t) => c -> fl(math.pow(t / grand, 0.3) * 1e6) }
    val sSum = sTemp.values.sum.toDouble
    val boost = perC.keys.map { c =>
      val q = fl(sTemp(c) / sSum * 1e6)
      c -> fl(q.toDouble / math.max(pPpm(c), 1L) * 1e3)
    }.toMap
    val bMax = boost.values.max
    val rate = boost.map { case (c, b) => c -> b * 1000 / bMax }
    def pHash(w: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString, 16)
    val expected = ntokOf.keys.toSeq.collect {
      case id if cidOf.contains(id) &&
        pHash(s"ctemp:$id") % 1000 < rate(cidOf(id)) =>
        (id, cidOf(id), pHash(s"ctemp:$id") % 1000)
    }.toSet
    val got = Similarity.queries("smp_cluster_temp")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"only-got ${got -- expected}\nonly-expected ${(expected -- got).take(5)}")
    assert(got.nonEmpty && got.size < ntokOf.size,
      "temperature selection must keep a strict, non-empty subset")
  }

  test("txt_classifier_calib equals a driver recompute from the scored stream") {
    val s = spark
    val docs = graft.sources.Tables.documents(s, sf)
    val scores = Classifier.queries("txt_classifier")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hq = docs.select(col("doc_id"),
        (substring(col("source"), 4, 10).cast("int") < 4).as("hq"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val mn = scores.values.min
    val mx = scores.values.max
    val width = (mx - mn + 10) / 10
    val expected = scores.toSeq.groupBy { case (_, lo) =>
        math.min((lo - mn) / width, 9L) }
      .map { case (b, xs) =>
        (b, xs.size.toLong,
          xs.count(_._2 > 0).toLong,
          xs.count(x => hq(x._1)).toLong,
          xs.map(_._2).min, xs.map(_._2).max)
      }.toSet
    val got = Classifier.queries("txt_classifier_calib")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    // the planted separable corpus sanity: calibration monotone —
    // top bucket purer than bottom bucket on the REAL corpus
    val byB = got.map(t => t._1 -> t).toMap
    val lo = byB(got.map(_._1).min); val hi = byB(got.map(_._1).max)
    assert(hi._4.toDouble / hi._2 >= lo._4.toDouble / lo._2,
      s"actual-HQ fraction should not fall with score: $lo vs $hi")
  }
}
