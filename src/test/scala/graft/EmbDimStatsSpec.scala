package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** `emb_dim_stats` must equal a plain-Scala per-dimension recompute
  * (the integerized-sum discipline makes that equality exact, not
  * approximate) and behave like statistics: variance non-negative,
  * min ≤ mean-ish ≤ max.
  */
class EmbDimStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("equals a plain-Scala integerized recompute") {
    val s = spark
    import s.implicits._
    val vecs = graft.sources.Tables.embeddings(spark, sf)
      .select(col("embedding")).as[Array[Double]].collect()
    val dims = vecs.head.length
    def fl(x: Double): Long = math.floor(x).toLong
    val expected = (1 to dims).map { dim =>
      val xs = vecs.map(_(dim - 1))
      val n = xs.length.toLong
      val sx = xs.map(x => fl(x * 1048576d + 0.5)).sum
      val sxx = xs.map(x => fl(x * x * 1073741824d + 0.5)).sum
      val m = sx.toDouble / 1048576d / n
      val v = sxx.toDouble / 1073741824d / n - m * m
      def pr6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      (dim.toLong, n, fl(m * 1000000d + 0.5), fl(v * 1000000d + 0.5),
        pr6(xs.min), pr6(xs.max))
    }
    val got = Similarity.queries("emb_dim_stats")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expected)
    got.foreach { case (dim, n, mean, v, mn, mx) =>
      assert(v >= 0L, s"dim $dim variance $v")
      assert(mn <= mx && n > 0)
      assert(mn * 1e6 - 1 <= mean && mean <= mx * 1e6 + 1, s"dim $dim mean outside range")
    }
  }
}
