package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScaleOps
import graft.streaming.GapMonitor

/** Property tests for the hand-rolled distributed algorithms — the
  * pieces where a boundary bug would silently corrupt results at
  * scale: the bucketed prefix sum (vs the sequential scan), the
  * bucketed gap scan (vs a direct set computation), and the gap
  * bitmap (vs a reference implementation on sets).
  */
class DistributedAlgoPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("prefixSum equals the sequential running sum on random inputs") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 400)
      ids <- Gen.pick(n, 1 to 10000)
      vals <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    } yield ids.toSeq.sorted.zip(vals)
    for (seed <- 1L to 8L) {
      val rows = sample(gen, seed)
      val df = rows.toDF("id", "v").repartition(5)
      val got = ScaleOps.prefixSum(df, "id", "v", "cum", buckets = 6)
        .select($"id", $"cum").as[(Int, Long)].collect().toMap
      var acc = 0L
      rows.foreach { case (id, v) =>
        acc += v
        assert(got(id) == acc, s"seed=$seed id=$id")
      }
    }
  }

  test("prefixSumBy equals the per-group sequential running sum") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 400)
      ids <- Gen.pick(n, 1 to 10000)
      grps <- Gen.listOfN(n, Gen.choose(0, 4))
      vals <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    } yield ids.toSeq.sorted.lazyZip(grps).lazyZip(vals).toSeq
    for (seed <- 1L to 8L) {
      val rows = sample(gen, seed)
      val df = rows.toDF("id", "g", "v").repartition(5)
      val got = ScaleOps.prefixSumBy(df, "g", "id", "v", "cum", buckets = 6)
        .select($"id", $"cum").as[(Int, Long)].collect().toMap
      val acc = scala.collection.mutable.Map[Int, Long]().withDefaultValue(0L)
      rows.foreach { case (id, g, v) =>
        acc(g) += v
        assert(got(id) == acc(g), s"seed=$seed id=$id g=$g")
      }
    }
  }

  test("prefixSumBy matches the single-partition window form") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (i, s"s${i % 7}", (i * 31 % 101).toLong))
    val df = rows.toDF("id", "g", "v").repartition(9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"id")
      .rowsBetween(Long.MinValue, 0)
    val expect = df.withColumn("cum", sum($"v").over(w))
      .select($"id", $"cum").as[(Int, Long)].collect().toMap
    val got = ScaleOps.prefixSumBy(df, "g", "id", "v", "cum", buckets = 11)
      .select($"id", $"cum").as[(Int, Long)].collect().toMap
    assert(got == expect)
  }

  test("gapRanges equals the direct set computation on random id sets") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 300)
      ids <- Gen.pick(n, 1 to 2000)
    } yield ids.toSet
    for (seed <- 1L to 8L) {
      val ids = sample(gen, seed)
      val df = ids.toSeq.toDF("id").repartition(4)
      val got = ScaleOps.gapRanges(df, "id", startId = Some(1L), buckets = 7)
        .as[(Long, Long)].collect().toSeq.sorted
      // reference: runs of missing ids in [1, max]
      val mx = ids.max
      val missing = (1L to mx).filterNot(i => ids.contains(i.toInt))
      val expected = missing.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: tail, i) if i == e + 1 => (s, i) :: tail
        case (acc, i) => (i, i) :: acc
      }.reverse
      assert(got == expected, s"seed=$seed")
    }
  }

  test("mergeLeft agrees with a direct reference merge on random tables") {
    import spark.implicits._
    case class Node(hb: Long, ts: Long, alive: Boolean)
    val now = 1000000000L
    val timeoutSec = 100L
    val nodeGen = for {
      hb <- Gen.choose(0L, 10L)
      ts <- Gen.choose(now - 300000000L, now)
      alive <- Gen.oneOf(true, false)
    } yield Node(hb, ts, alive)
    val tableGen = for {
      n <- Gen.choose(0, 20)
      ids <- Gen.pick(n, 1 to 30)
      nodes <- Gen.listOfN(n, nodeGen)
    } yield ids.toSeq.zip(nodes).toMap
    def df(t: Map[Int, Node]) =
      t.toSeq.map { case (id, n) => (id.toLong, n.hb, n.ts, n.alive) }
        .toDF("id", "hb", "ts_us", "alive")
    // direct port of gossip.go:87-108 over Scala maps
    def reference(l: Map[Int, Node], r: Map[Int, Node]): Map[Int, (Node, String)] = {
      val stale = l.map { case (id, n) =>
        id -> n.copy(alive = n.alive && !(now > n.ts + timeoutSec * 1000000L))
      }
      (stale.keySet ++ r.keySet).map { id =>
        (stale.get(id), r.get(id)) match {
          case (None, Some(rn)) => id -> ((rn, "right"))
          case (Some(ln), None) => id -> ((ln, "left"))
          case (Some(ln), Some(rn)) =>
            if (rn.alive && (rn.hb > ln.hb || (!ln.alive && rn.hb < ln.hb)))
              id -> ((rn, "right"))
            else id -> ((ln, "left"))
          case (None, None) => sys.error("unreachable")
        }
      }.toMap
    }
    for (seed <- 1L to 10L) {
      val l = sample(tableGen, seed)
      val r = sample(tableGen, seed + 1000)
      val got = graft.operators.Gossip.mergeLeft(df(l), df(r), now, timeoutSec)
        .collect().map(row => row.getLong(0).toInt ->
          ((Node(row.getLong(1), row.getLong(2), row.getBoolean(3)),
            row.getString(4)))).toMap
      assert(got == reference(l, r), s"seed=$seed")
    }
  }

  test("gap bitmap agrees with a set-based reference on random buckets") {
    val bucketSize = 64L
    val gen = for {
      bucket <- Gen.choose(0L, 3L)
      ids <- Gen.someOf(0 until bucketSize.toInt)
    } yield (bucket, ids.map(o => bucket * bucketSize + o).toSet)
    for (seed <- 1L to 30L) {
      val (bucket, ids) = sample(gen, seed)
      val bits = new Array[Byte](((bucketSize + 7) / 8).toInt)
      ids.foreach { id =>
        val off = (id - bucket * bucketSize).toInt
        bits(off >> 3) = (bits(off >> 3) | (1 << (off & 7))).toByte
      }
      val got = GapMonitor.openGaps(bucket, bits, bucketSize)
      val expected = if (ids.isEmpty) Seq.empty else {
        val lo = math.max(bucket * bucketSize, 1L)
        val hi = ids.max
        val missing = (lo until hi).filterNot(ids.contains)
        missing.foldLeft(List.empty[(Long, Long)]) {
          case ((s, e) :: tail, i) if i == e + 1 => (s, i) :: tail
          case (acc, i) => (i, i) :: acc
        }.reverse
      }
      assert(got == expected, s"seed=$seed bucket=$bucket ids=$ids")
    }
  }
}
