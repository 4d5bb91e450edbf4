package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

/** Pins for the fixed-point PageRank: exact equality against a
  * plain-Scala Long-arithmetic reference on a planted graph (the same
  * 10⁻¹² units / div truncation the operator documents), duplicate
  * pair collapse, and partition-count invariance of the BIGINT ranks.
  */
class GraphPagerankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val U = 1000000000000L

  /** Independent reference: adjacency maps + Long division, no Spark. */
  private def ref(pairs: Seq[(Long, Long)], rounds: Int): Map[String, Long] = {
    val adj = scala.collection.mutable.Map[String, Set[String]]()
      .withDefaultValue(Set.empty)
    pairs.distinct.foreach { case (p, s) =>
      adj(s"p$p") += s"s$s"
      adj(s"s$s") += s"p$p"
    }
    val nodes = adj.keySet.toSeq
    val n = nodes.size
    var r = nodes.map(_ -> U / n).toMap
    (1 to rounds).foreach { _ =>
      val sc = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      adj.foreach { case (u, outs) =>
        val c = r(u) / outs.size
        outs.foreach(v => sc(v) += c)
      }
      r = nodes.map(v => v -> ((U / n) * 15 / 100 + 85 * sc(v) / 100)).toMap
    }
    r
  }

  private val pairs = Seq[(Long, Long)](
    (1, 1), (1, 1), // duplicate lineitem rows → ONE edge pair
    (2, 1), (2, 2), (3, 2), (3, 3), (4, 3))

  private def planted = {
    val s = spark
    import s.implicits._
    pairs.toDF("l_partkey", "l_suppkey")
  }

  test("rank_fixed equals the plain-Scala fixed-point reference exactly") {
    val exp = ref(pairs, rounds = 3)
    val got = Graph.pagerankOf(planted, rounds = 3, topK = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(got.length == exp.size) // topK beyond N returns every node
    got.foreach { case (node, rf) =>
      assert(rf == exp(node), s"node $node")
    }
    // ordering: rank desc, node asc — verified against the reference
    val expOrder = exp.toSeq.sortBy { case (n, r) => (-r, n) }.map(_._1)
    assert(got.map(_._1).toSeq == expOrder)
  }

  test("rank column is the pround(1e-12 · rank_fixed, 8) rendering") {
    Graph.pagerankOf(planted, rounds = 3, topK = 100).collect().foreach { r =>
      val expected =
        math.floor(r.getLong(1).toDouble / U * 1e8 + 0.5) / 1e8
      assert(r.getDouble(2) == expected)
    }
  }

  test("BIGINT ranks are partition-count invariant") {
    val one = Graph.pagerankOf(planted.repartition(1), 3, 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val many = Graph.pagerankOf(planted.repartition(7), 3, 100)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(one == many)
  }

  test("random graphs match the reference exactly at every round count") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val rpairs = Seq.fill(8 + rnd.nextInt(25))(
        (rnd.nextInt(8).toLong + 1, rnd.nextInt(6).toLong + 1))
      val df = rpairs.toDF("l_partkey", "l_suppkey")
      val rounds = 1 + rnd.nextInt(3)
      val exp = ref(rpairs, rounds)
      val got = Graph.pagerankOf(df, rounds, 1000).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exp, s"seed=$seed rounds=$rounds")
    }
  }

  test("the broadcast serving core is bit-equal to the lazy SMJ core") {
    val s = spark
    import s.implicits._
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(100 + seed)
      val rpairs = Seq.fill(10 + rnd.nextInt(30))(
        (rnd.nextInt(9).toLong + 1, rnd.nextInt(7).toLong + 1))
      val df = rpairs.toDF("l_partkey", "l_suppkey")
      val rounds = 1 + rnd.nextInt(3)
      val lazyRes = Graph.pagerankOf(df, rounds, 1000).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      val bcastRes = Graph.pagerankBroadcastOf(df, rounds, 1000).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(bcastRes == lazyRes, s"seed=$seed rounds=$rounds")
    }
  }

  test("more rounds keep total mass bounded by the fixed-point unit") {
    // truncation only ever LOSES mass: Σ rank_fixed ≤ 10¹² every round
    (1 to 4).foreach { rounds =>
      val total = Graph.pagerankOf(planted, rounds, 100)
        .agg(sum(col("rank_fixed"))).collect()(0).getLong(0)
      assert(total <= U && total > (U * 9) / 10, s"rounds=$rounds total=$total")
    }
  }
}
