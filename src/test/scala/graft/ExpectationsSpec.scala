package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Expectations

/** The synthetic corpus passes every expectation, so this spec plants
  * one violation batch per rule and asserts each rule fires with the
  * exact violation count — plus the all-clean case staying green.
  */
class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType), StructField("lang", StringType),
    StructField("n_chars", LongType)))
  private val evtSchema = StructType(Seq(
    StructField("ts", TimestampType, nullable = true),
    StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType,
      nullable = true)))

  private def mkDocs(rows: Seq[Row]) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows), docSchema)
  private def mkEvts(rows: Seq[Row]) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows), evtSchema)
  private def mkKeys(name: String, keys: Seq[Long]) = {
    val s = spark
    import s.implicits._
    keys.toDF(name)
  }

  private val ts = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")

  test("every rule fires with the exact planted violation count") {
    val docs = mkDocs(Seq(
      Row(null, "ok text", "en", 7L),            // doc_id_not_null
      Row(5L, "dup", "en", 3L),                   // }
      Row(5L, "dup", "en", 3L),                   // } doc_id_unique (1 surplus)
      Row(6L, "weird", "xx", 5L),                 // lang_known
      Row(7L, "", "fr", 0L),                      // text_nonempty
      Row(8L, "abc", "de", 99L),                  // n_chars_consistent
      Row(9L, "clean", "zh", 5L)))
    val evts = mkEvts(Seq(
      Row(null, "click", 1.0, "{}"),              // ts_not_null
      Row(ts, "hover", 1.0, "{}"),                // event_type_known
      Row(ts, "view", 0.0, "{}"),                 // }
      Row(ts, "view", -2.0, "{}"),                // } value_positive (2)
      Row(ts, "click", 1.0, null),                // props_not_null
      Row(ts, "signup", 3.5, "{}")))
    val li = mkKeys("l_orderkey", Seq(1L, 2L, 99L)) // 99 is an orphan
    val ord = mkKeys("o_orderkey", Seq(1L, 2L, 3L))
    val got = Expectations.expectationsOf(docs, evts, li, ord).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    val expected = Map(
      ("documents", "doc_id_not_null")    -> 1L,
      ("documents", "doc_id_unique")      -> 1L,
      ("documents", "lang_known")         -> 1L,
      ("documents", "text_nonempty")      -> 1L,
      ("documents", "n_chars_consistent") -> 1L,
      ("events", "ts_not_null")           -> 1L,
      ("events", "event_type_known")      -> 1L,
      ("events", "value_positive")        -> 2L,
      ("events", "props_not_null")        -> 1L,
      ("lineitem", "orderkey_in_orders")  -> 1L)
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k @ (tbl, _), v) =>
      val (nRows, nViol, pass) = got(k)
      assert(nViol == v, s"violations of $k")
      assert(!pass, s"pass flag of $k")
      assert(nRows == (if (tbl == "documents") 7L
                       else if (tbl == "events") 6L else 3L))
    }
  }

  test("clean batches pass every rule with zero violations") {
    val docs = mkDocs(Seq(Row(1L, "ok", "en", 2L), Row(2L, "bien", "es", 4L)))
    val evts = mkEvts(Seq(Row(ts, "view", 1.5, "{}")))
    val got = Expectations.expectationsOf(docs, evts,
      mkKeys("l_orderkey", Seq(1L)), mkKeys("o_orderkey", Seq(1L))).collect()
    assert(got.length == 10)
    got.foreach { r =>
      assert(r.getLong(3) == 0L && r.getBoolean(4), r.getString(1))
    }
  }
}
