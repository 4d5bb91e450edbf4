package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational
import graft.streaming.StreamingAnomaly

/** The streaming anomaly detector must equal the batch `evt_anomaly`
  * query row for row — same integer sufficient statistics, same
  * double expression order, same warm-up and zero-variance guards —
  * across micro-batch boundaries, with state bounded to the trailing
  * day per type.
  */
class StreamingAnomalySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val baseHour = 474600L

  /** counts per hour: i % 3 + 1 with a spike of 50 at hour 25 (the
    * EvtAnomalySpec corpus), plus a constant "flat" type
    */
  private def cnt(i: Int): Int = if (i == 25) 50 else i % 3 + 1

  private def batchEvents = {
    val s = spark
    import s.implicits._
    val rows = for {
      i <- 0 to 25
      typ <- Seq("spiky", "flat")
      n = if (typ == "spiky") cnt(i) else 2
      j <- 0 until n
    } yield (new Timestamp(((baseHour + i) * 3600L + j * 60L) * 1000L), typ)
    rows.toDF("ts", "event_type")
  }

  test("streaming equals batch across micro-batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, Long)]
    val q = StreamingAnomaly.anomalies(in.toDS())
      .writeStream.format("memory").queryName("anom_out")
      .outputMode("append").start()
    try {
      val feed = for {
        i <- 0 to 25
        typ <- Seq("spiky", "flat")
      } yield (typ, baseHour + i,
        (if (typ == "spiky") cnt(i) else 2).toLong)
      // three micro-batches split mid-history to exercise state carry
      val (b1, rest) = feed.splitAt(14)
      val (b2, b3) = rest.splitAt(20)
      Seq(b1, b2, b3).foreach { b =>
        in.addData(b: _*)
        q.processAllAvailable()
      }
      val streamed = spark.table("anom_out")
        .as[StreamingAnomaly.AnomalyRow].collect()
        .map(r => (r.event_type, r.hour_id, r.cnt, r.n_frame, r.mean,
          r.z, r.is_anomaly)).toSet
      val batch = Relational.evtAnomalyOf(batchEvents).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toSet
      assert(batch.nonEmpty && streamed == batch)
      // state is bounded: one row per event_type
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 2L)
    } finally q.stop()
  }

  test("the composed raw-events pipeline equals batch on finalized hours") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val q = StreamingAnomaly.fromEvents(
        in.toDF().toDF("ts", "event_type"))
      .writeStream.format("memory").queryName("anom_e2e")
      .outputMode("append").start()
    try {
      val evRows = for {
        i <- 0 to 25
        typ <- Seq("spiky", "flat")
        n = if (typ == "spiky") cnt(i) else 2
        j <- 0 until n
      } yield (new Timestamp(((baseHour + i) * 3600L + j * 60L) * 1000L), typ)
      val (b1, b2) = evRows.splitAt(evRows.length / 2)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      // a far-future sentinel advances the watermark past every real
      // window (its own hour has an empty trailing frame → no row)
      in.addData((new Timestamp((baseHour + 4000L) * 3600L * 1000L), "spiky"))
      q.processAllAvailable()
      val streamed = spark.table("anom_e2e")
        .as[StreamingAnomaly.AnomalyRow].collect()
        .map(r => (r.event_type, r.hour_id, r.cnt, r.n_frame, r.mean,
          r.z, r.is_anomaly)).toSet
      val batch = Relational.evtAnomalyOf(batchEvents).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toSet
      assert(batch.nonEmpty && streamed == batch)
    } finally q.stop()
  }

  test("replayed hourly rows do not double-count (at-least-once safe)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long, Long)]
    val q = StreamingAnomaly.anomalies(in.toDS())
      .writeStream.format("memory").queryName("anom_out2")
      .outputMode("append").start()
    try {
      val feed = (0 to 13).map(i => ("a", baseHour + i, cnt(i).toLong))
      in.addData(feed: _*)
      q.processAllAvailable()
      in.addData(("a", baseHour + 13, cnt(13).toLong)) // replay of hour 13
      in.addData(("a", baseHour + 14, cnt(14).toLong))
      q.processAllAvailable()
      val rows = spark.table("anom_out2")
        .as[StreamingAnomaly.AnomalyRow].collect()
      // hour 14's frame must still be the 14 distinct prior hours
      val h14 = rows.filter(_.hour_id == baseHour + 14)
      assert(h14.length == 1 && h14.head.n_frame == 14L)
      // and the replayed hour 13 must NOT re-emit into the append
      // sink: exactly one row per finalized hour, not one per delivery
      assert(rows.filter(_.hour_id == baseHour + 13).length == 1,
        "replayed finalized hour emitted a duplicate append row")
      assert(rows.groupBy(r => (r.event_type, r.hour_id)).forall(_._2.length == 1))
    } finally q.stop()
  }
}
