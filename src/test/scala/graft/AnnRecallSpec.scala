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
}
