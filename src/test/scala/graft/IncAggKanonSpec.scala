package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Expectations, Relational}

/** Pins for the incremental-aggregation merge (merge of disjoint
  * batch partials == full recompute, including odd/even coverage) and
  * the k-anonymity audit arithmetic.
  */
class IncAggKanonSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("merge of batch partials equals the full single-pass aggregate") {
    val s = spark
    import s.implicits._
    val base = 474600L * 3600L
    val ev = (1 to 200).map { i =>
      (i.toLong, new Timestamp((base + (i % 7) * 3600L + i) * 1000L),
        s"t${i % 3}", i * 0.123)
    }.toDF("event_id", "ts", "event_type", "value")
    val inc = Relational.evtHourlyIncOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val full = ev
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hour_id"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(floor(value * 1000 + 0.5) AS BIGINT)")).as("sm"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(inc == full && inc.values.map(_._1).sum == 200L)
  }

  test("k-anonymity flags exactly the groups below k") {
    val s = spark
    import s.implicits._
    val docs = (
      (1 to 6).map(i => (i.toLong, "en", "s1", 250L)) ++   // bucket 1, n=6
      Seq((7L, "en", "s1", 450L)) ++                        // bucket 2, n=1
      (8 to 12).map(i => (i.toLong, "fr", "s2", 10L))       // bucket 0, n=5
    ).toDF("doc_id", "lang", "source", "n_chars")
    val got = Expectations.kanonOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("en", "s1", 1L, 6L, false),
      ("en", "s1", 2L, 1L, true),
      ("fr", "s2", 0L, 5L, false)))
  }
}
