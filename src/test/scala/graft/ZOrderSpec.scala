package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, ScaleOps}

/** Pins for the Z-order layout machinery: the magic-mask interleave
  * against an independent per-bit walk, hand anchors at the corner
  * values, the per-tile span bound `ops_zorder` advertises, and the
  * quantified comparison against a time-sorted layout (whose
  * equal-count chunks span essentially the whole user dimension).
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** Independent reference: interleave bit-by-bit, no magic masks. */
  private def interleaveRef(x: Int, y: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1).toLong << (2 * i)
      z |= ((y >> i) & 1).toLong << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue matches the per-bit reference on corners and random values") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq((0, 0), (0xFFFF, 0), (0, 0xFFFF), (0xFFFF, 0xFFFF), (1, 1), (2, 1)) ++
      Seq.fill(500)((rnd.nextInt(65536), rnd.nextInt(65536)))
    val s = spark
    import s.implicits._
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"),
              ScaleOps.zValue(col("x").cast("long"), col("y").cast("long")).as("z"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) == interleaveRef(x, y), s"($x, $y)")
    }
    assert(got((0xFFFF, 0)) == 0x55555555L)
    assert(got((0, 0xFFFF)) == 0xAAAAAAAAL)
  }

  test("every Z-tile is bounded in BOTH dims; time-sorted chunks are not") {
    val events = graft.sources.Tables.events(spark, sf)
    val audit = Relational.zorderAuditOf(events).collect()
    assert(audit.nonEmpty)
    audit.foreach { r =>
      assert(r.getLong(4) <= 4096, s"x_span ${r.getLong(4)} in tile ${r.getLong(0)}")
      assert(r.getLong(7) <= 4096, s"y_span ${r.getLong(7)} in tile ${r.getLong(0)}")
    }

    // the comparison layout: same quantization, but chunks of equal
    // event count in TIME order — each chunk's user-dim span is near
    // the full 65536-cell range, so a user_id filter prunes nothing
    val rows = events.select(col("user_id"), col("ts").cast("long").as(("sec")))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val uMin = rows.map(_._1).min; val uMax = rows.map(_._1).max
    def qx(u: Long): Long =
      math.floor((u - uMin).toDouble * 65536d / (uMax - uMin + 1)).toLong
    val nChunks = 16
    val byTime = rows.sortBy(_._2).grouped(math.max(1, rows.length / nChunks)).toSeq
    val meanTimeSpan = byTime.map { ch =>
      val qs = ch.map(r => qx(r._1)); (qs.max - qs.min + 1).toDouble
    }.sum / byTime.size
    assert(meanTimeSpan > 4 * 4096,
      s"time-sorted chunks should span the user dim (got mean $meanTimeSpan)")
  }
}
