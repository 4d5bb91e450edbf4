package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Differential check of the SemDeDup pass: an independent plain-Scala
  * re-computation (nearest sampled centroid → within-cluster pairwise
  * cosine → greedy drop reduction) must agree exactly with the
  * distributed plan on the real test corpus.
  */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def pround(x: Double, p: Int): Double = {
    val s = math.pow(10, p)
    math.floor(x * s + 0.5) / s
  }

  private lazy val vecs: Array[(Long, Array[Double])] = {
    import spark.implicits._
    graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The ivfStride formula: max(50, 2^(bitlen(N)/2)). */
  private def stride(n: Long): Long =
    math.max(50L, 1L << (java.lang.Long.toBinaryString(n).length / 2))

  private lazy val reference: Map[Long, (Long, Double)] = {
    val st = stride(vecs.length.toLong)
    val cents = vecs.filter(_._1 % st == 0)
    // nearest centroid: pround(ccos,6) desc, cid asc — the ivfAssignment contract
    val assign = vecs.map { case (id, v) =>
      val best = cents.map { case (cid, cv) => (cid, pround(cos(v, cv), 6)) }
        .minBy { case (cid, c) => (-c, cid) }
      (id, best._1)
    }.toMap
    val dropped = scala.collection.mutable.Map.empty[Long, (Long, Double)]
    for {
      (a, av) <- vecs; (b, bv) <- vecs
      if a < b && assign(a) == assign(b)
      c = pround(cos(av, bv), 4)
      if c >= Similarity.SemDupThreshold
    } {
      val prev: (Long, Double) = dropped.getOrElse(b, (Long.MaxValue, Double.MinValue))
      dropped(b) = (math.min(prev._1, a), math.max(prev._2, c))
    }
    dropped.toMap
  }

  test("distributed drop list equals the plain-Scala reference") {
    import spark.implicits._
    val got = Similarity.semanticDedup(spark, sf)
      .as[(Long, Long, Double)].collect()
      .map { case (d, k, c) => d -> (k, c) }.toMap
    assert(got === reference)
    info(s"${got.size} dropped of ${vecs.length} vectors")
  }

  test("the corpus contains semantic duplicates and the pass finds them") {
    assert(reference.nonEmpty,
      "test corpus has no same-cluster pair above the threshold — threshold or data drifted")
    reference.foreach { case (drop, (kept, c)) =>
      assert(kept < drop && c >= Similarity.SemDupThreshold)
    }
  }

  test("capped pass equals uncapped when clusters fit, restricts pairing when not") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val assigned = {
      // reuse the real corpus assignment via the public query path:
      // join the registered assignment columns back together
      val e = graft.sources.Tables.embeddings(spark, sf)
        .select(col("vec_id"),
          org.apache.spark.sql.functions.expr(
            "transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("nrm", org.apache.spark.sql.functions.sqrt(
          graft.functions.DotProduct.dot_product(col("v"), col("v"))))
      val lists = Similarity.queries("ann_ivf_lists")(spark, sf)
        .select(col("vec_id"), col("cid"), col("centroid_cos").as("ccos"))
      lists.join(e, Seq("vec_id"))
    }
    def dropSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("drop_id"), col("kept_id")).as[(Long, Long)].collect().toSet
    // cap far above any cluster's occupancy: identical to uncapped
    val uncapped = dropSet(Similarity.semanticDedup(spark, sf))
    val wide = dropSet(Similarity.semanticDedupCappedOf(assigned, 10000))
    assert(wide === uncapped)
    // cap 1: one member per cluster pairs with nobody — empty output
    assert(dropSet(Similarity.semanticDedupCappedOf(assigned, 1)).isEmpty)
  }
}
