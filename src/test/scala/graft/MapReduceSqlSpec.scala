package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MapReduceSql, WordCountJob}

/** Pin for the MapReduceJob SQL front door (`mr_sql_wc`): the SQL
  * string path (wc_map UDF + LATERAL VIEW explode + wc_reduce udaf)
  * must equal the typed `run` path bit for bit — both halves ARE the
  * same plugin functions, so any divergence means the registration
  * plumbing changed semantics. Cross-engine exactness is the oracle
  * gate's job.
  */
class MapReduceSqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("the SQL front door equals the typed plugin run") {
    val s = spark
    import s.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
      .selectExpr("CAST(doc_id AS STRING)", "text").as[(String, String)]
    val typed = WordCountJob.run(docs).collect().toMap
    val sql = MapReduceSql.wordCountSql(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sql.nonEmpty)
    assert(sql === typed)
  }

  test("the SQL path keeps map-side partial aggregation (no value lists)") {
    // the plan must carry a partial HashAggregate BELOW the exchange —
    // the scale contract the typed path already pins
    val plan = MapReduceSql.wordCountSql(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_wc_reduce") || plan.contains("partial"),
      s"no partial aggregation in:\n$plan")
  }
}
