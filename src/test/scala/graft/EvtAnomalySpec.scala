package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Pins for the trailing-window anomaly detector: a planted spike is
  * z-scored exactly as the integer-sufficient-statistics recompute
  * says, constant (zero-variance) series emit nothing, and the
  * n_frame ≥ 12 warm-up gate holds hour by hour.
  */
class EvtAnomalySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // hours are absolute epoch hours (TZ-free: Timestamps are built from
  // epoch millis, never from a local-time string), ~2024-03 era
  private val baseHour = 474600L
  private val baseSec = baseHour * 3600L

  /** counts per hour for the planted type: i % 3 + 1, spike 50 at 25 */
  private def cnt(i: Int): Int = if (i == 25) 50 else i % 3 + 1

  private def planted = {
    val s = spark
    import s.implicits._
    val rows = for {
      i <- 0 to 25
      typ <- Seq("spiky", "flat")
      n = if (typ == "spiky") cnt(i) else 2 // "flat" is constant
      j <- 0 until n
    } yield (new Timestamp((baseSec + i * 3600L + j * 60L) * 1000L), typ)
    rows.toDF("ts", "event_type")
  }

  test("spike hour matches the integer-sufficient-statistics recompute") {
    val rows = Relational.evtAnomalyOf(planted).collect()
      .filter(_.getString(0) == "spiky")
      .map(r => r.getLong(1) -> r).toMap
    val spike = rows(baseHour + 25)
    // trailing frame of hour 25 = hours 1..24, all present
    val frame = (1 to 24).map(cnt)
    val n = frame.size
    val sm = frame.sum.toLong
    val s2 = frame.map(c => c.toLong * c).sum
    val mean = sm.toDouble / n
    val z = (50 - mean) / math.sqrt((s2 - sm.toDouble * sm / n) / (n - 1))
    def p4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    assert(spike.getLong(2) == 50L)            // cnt
    assert(spike.getLong(3) == 24L)            // n_frame
    assert(spike.getDouble(4) == p4(mean))
    assert(spike.getDouble(5) == p4(z))
    assert(spike.getBoolean(6))                // |z| > 2 → anomaly
    // the steady hours around it are not anomalous
    assert(!rows(baseHour + 24).getBoolean(6))
  }

  test("warm-up gate: first emitted hour is the 13th (12 prior in range)") {
    val hours = Relational.evtAnomalyOf(planted).collect()
      .filter(_.getString(0) == "spiky").map(_.getLong(1)).sorted
    assert(hours.head == baseHour + 12)
    assert(hours.length == 26 - 12)
  }

  test("random series match the sufficient-statistics reference on every row") {
    val s = spark
    import s.implicits._
    def p4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val counts = (0 until 40).map(_ => 1 + rnd.nextInt(9))
      val rows = for {
        i <- 0 until 40; j <- 0 until counts(i)
      } yield (new Timestamp((baseSec + i * 3600L + j * 60L) * 1000L), "r")
      val got = Relational.evtAnomalyOf(rows.toDF("ts", "event_type"))
        .collect().map(r => r.getLong(1) -> r).toMap
      (0 until 40).foreach { i =>
        val frame = (math.max(0, i - 24) until i).map(counts)
        val n = frame.size.toLong
        val sm = frame.map(_.toLong).sum
        val s2 = frame.map(c => c.toLong * c).sum
        val expected = n >= 12 && s2 * n > sm * sm
        assert(got.contains(baseHour + i) == expected, s"seed=$seed hour=$i")
        if (expected) {
          val row = got(baseHour + i)
          val mean = sm.toDouble / n
          val z = (counts(i) - mean) /
            math.sqrt((s2 - sm.toDouble * sm / n) / (n - 1))
          assert(row.getLong(3) == n && row.getDouble(4) == p4(mean) &&
            row.getDouble(5) == p4(z), s"seed=$seed hour=$i")
        }
      }
    }
  }

  test("zero-variance series emit no rows at all") {
    val flat = Relational.evtAnomalyOf(planted).collect()
      .filter(_.getString(0) == "flat")
    assert(flat.isEmpty) // s2·n > sm² is false for a constant series
  }
}
