package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** ANN quality: recall of the indexed paths against the exact
  * brute-force top-3. The synthetic embeddings are near-isotropic
  * (max pairwise cosine ~0.51), the hard case for ANN — recall
  * numbers are recorded in SCALE.md; here we assert the structural
  * floor: indexes return results and beat random-bucket recall.
  */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.01"

  private def topSets(df: org.apache.spark.sql.DataFrame,
                      maxRank: Int): Map[Long, Set[Long]] = {
    import spark.implicits._
    df.filter($"rank" <= maxRank)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  test("k-means training monotonically reduces IVF inertia") {
    val init = Similarity.trainIvfCentroids(spark, sf, iters = 0)
    val i0 = Similarity.ivfInertia(spark, sf, init)
    val t1 = Similarity.trainIvfCentroids(spark, sf, iters = 1)
    val i1 = Similarity.ivfInertia(spark, sf, t1)
    val t3 = Similarity.trainIvfCentroids(spark, sf, iters = 3)
    val i3 = Similarity.ivfInertia(spark, sf, t3)
    info(f"inertia: init=$i0%.2f iter1=$i1%.2f iter3=$i3%.2f")
    assert(i1 <= i0 && i3 <= i1)
  }

  test("IVF and LSH recall vs exact top-3; trained centroids don't lose to sampled") {
    val brute = topSets(Similarity.annBrute(spark, sf), 3)
    val total = brute.values.map(_.size).sum.toDouble
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = topSets(df, 3)
      brute.map { case (q, s) => (got.getOrElse(q, Set.empty) & s).size }.sum / total
    }
    val ivf = recallOf(Similarity.annIvf(spark, sf))
    val trained = recallOf(Similarity.annIvfTrained(spark, sf))
    val lsh = recallOf(Similarity.annLsh(spark, sf))
    val mp = recallOf(Similarity.annLshMultiProbe(spark, sf))
    info(f"ivf recall@3 = $ivf%.3f  trained = $trained%.3f  lsh = $lsh%.3f  lsh_mp = $mp%.3f")
    assert(ivf >= 0.3, s"ivf recall $ivf below floor 0.3")
    assert(lsh >= 0.05, s"lsh recall $lsh below floor 0.05")
    // multi-probe candidates are a superset of single-probe's (mask 0
    // is the home bucket), so its recall can never be lower — and the
    // Hamming-1 expansion must lift it meaningfully, not marginally
    assert(mp >= lsh, s"multi-probe recall $mp below single-probe $lsh")
    assert(mp >= 0.4, s"multi-probe recall $mp below floor 0.4")
    assert(trained >= ivf,
      s"Lloyd-trained centroids ($trained) must not lose recall vs sampled ($ivf)")
  }

  test("registered recall-audit queries equal the spec's own recall arithmetic") {
    // the audit surface (ann_ivf_recall / ann_lsh_recall) must agree
    // with this suite's independent recall computation from the two
    // registered search surfaces it audits
    val brute = topSets(Similarity.annBrute(spark, sf), 3)
    def expected(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long, Long)] = {
      val got = topSets(df, 3)
      brute.map { case (q, s) =>
        val hit = (got.getOrElse(q, Set.empty) & s).size.toLong
        q -> (s.size.toLong, hit, hit * 1000 / s.size)
      }
    }
    def audited(name: String): Map[Long, (Long, Long, Long)] =
      Similarity.queries(name)(spark, sf).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(audited("ann_ivf_recall") == expected(Similarity.annIvf(spark, sf)))
    assert(audited("ann_lsh_recall") == expected(Similarity.annLsh(spark, sf)))
  }

  test("IVF-PQ: compression-funded nprobe=4 beats the nprobe=2 IVF plateau") {
    val brute = topSets(Similarity.annBrute(spark, sf), 3)
    val total = brute.values.map(_.size).sum.toDouble
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = topSets(df, 3)
      brute.map { case (q, s) => (got.getOrElse(q, Set.empty) & s).size }.sum / total
    }
    val ivf = recallOf(Similarity.annIvf(spark, sf))
    val pq = recallOf(Similarity.annIvfPq(spark, sf))
    info(f"ivf recall@3 = $ivf%.3f  ivf_pq = $pq%.3f")
    // the point of PQ: 4-byte codes let the same memory budget probe
    // twice the lists, and the exact re-rank keeps the shortlist
    // honest — recall must strictly beat the nprobe=2 flat index
    assert(pq > ivf, s"IVF-PQ recall $pq does not beat IVF ($ivf)")
    // hard floor kept BELOW the measured 0.600 on purpose: the
    // corpus can regenerate (the events.ts lesson) and the floor
    // must assert structure, not pin this corpus's exact number
    assert(pq >= 0.5, s"IVF-PQ recall $pq below floor 0.5")
  }

  /** Clustered corpus: 4 Gaussian centers, 200 members each with
    * small noise (blocks of consecutive ids, so the stride-50 coarse
    * sampling lands 4 centroids inside every cluster). This is the
    * data IVFADC is designed for — the coarse quantizer explains most
    * of the variance, residuals are tiny — AND each cluster is 4× the
    * exact-re-rank shortlist, so the ADC ranking itself (not the
    * re-rank) decides recall.
    */
  private def clusteredVectors(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(4, 64)(rnd.nextGaussian())
    val rows = (0 until 800).map { i =>
      val c = centers(i / 200)
      (i.toLong, c.map(_ + 0.35 * rnd.nextGaussian()).toSeq)
    }
    val df = rows.toDF("vec_id", "v")
    df.withColumn("nrm",
      org.apache.spark.sql.functions.sqrt(
        graft.functions.DotProduct.dot_product(
          org.apache.spark.sql.functions.col("v"),
          org.apache.spark.sql.functions.col("v"))))
  }

  test("residual PQ (IVFADC): wins where the coarse lists explain the data; measured honestly where they don't") {
    // regime 1 — the near-isotropic driver corpus: best-centroid
    // cos ≈ 0.5, so residual variance ≈ 2× position variance
    // (2·(1−cos)); coding residuals COSTS recall here (measured 0.33
    // vs 0.60) and the spec pins only the structural floor. This is
    // the documented production guidance: choose position vs residual
    // coding from the corpus's mean centroid cosine.
    val brute = topSets(Similarity.annBrute(spark, sf), 3)
    val total = brute.values.map(_.size).sum.toDouble
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = topSets(df, 3)
      brute.map { case (q, s) => (got.getOrElse(q, Set.empty) & s).size }.sum / total
    }
    val res = recallOf(Similarity.annIvfPqRes(spark, sf))
    info(f"isotropic corpus: ivf_pq_res recall@3 = $res%.3f (position pq: 0.600)")
    assert(res >= 0.2, s"residual-PQ recall $res below structural floor 0.2")

    // regime 2 — clustered corpus: residual coding must strictly win
    // (measured 0.733 vs 0.567 — the Jégou et al. gap, visible here
    // because clusters exceed the shortlist so ADC ranking decides)
    import spark.implicits._
    val e = clusteredVectors()
    val vecs = e.select($"vec_id", $"v").as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val exact = (0L until 10L).map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (-math.floor(cos(vecs(q), vecs(n)) * 1e6), n))
        .take(3).toSet
    }.toMap
    def recallC(df: org.apache.spark.sql.DataFrame): Double = {
      val got = topSets(df, 3)
      exact.map { case (q, s) => (got.getOrElse(q, Set.empty) & s).size }.sum / 30.0
    }
    val pqC = recallC(Similarity.annIvfPqOf(e))
    val resC = recallC(Similarity.annIvfPqResOf(e))
    info(f"clustered corpus: ivf_pq recall@3 = $pqC%.3f  ivf_pq_res = $resC%.3f")
    assert(resC > pqC,
      s"residual-PQ ($resC) did not beat position-PQ ($pqC) on clustered data")
    // floor below the measured 0.733 (structure, not corpus pinning)
    assert(resC >= 0.65, s"residual-PQ clustered recall $resC below 0.65")
  }
}
