package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MapReduceSql, MaxLenJob, WordCountJob}

/** Pin for the MapReduceJob SQL front door (`mr_sql_wc` /
  * `mr_sql_maxlen`): the SQL string path (<name>_map UDF + LATERAL
  * VIEW explode + <name>_reduce udaf) must equal the typed `run`
  * path bit for bit FOR BOTH SHIPPED JOBS — both halves ARE the same
  * plugin functions, so any divergence means the generic
  * registration plumbing changed semantics. Cross-engine exactness
  * is the oracle gate's job. Also pins the child-session contract:
  * the front door must leave the caller's catalog and function
  * registry untouched.
  */
class MapReduceSqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def docs = {
    val s = spark
    import s.implicits._
    graft.sources.Tables.documents(spark, sf)
      .selectExpr("CAST(doc_id AS STRING)", "text").as[(String, String)]
  }

  test("the SQL front door equals the typed plugin run (word count)") {
    val s = spark
    import s.implicits._
    val typed = WordCountJob.run(docs).collect().toMap
    val sql = MapReduceSql.wordCountSql(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sql.nonEmpty)
    assert(sql === typed)
  }

  test("a swapped plugin runs through the SAME generic front door (max-len)") {
    val s = spark
    import s.implicits._
    val typed = MaxLenJob.run(docs).collect().toMap
    val sql = MapReduceSql.maxLenSql(spark, sf).collect()
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

  test("the front door leaves the caller's session untouched") {
    assert(!spark.catalog.tableExists("__mr_docs"),
      "temp view leaked into the caller's catalog")
    assert(!spark.catalog.functionExists("wc_map") &&
      !spark.catalog.functionExists("wc_reduce") &&
      !spark.catalog.functionExists("maxlen_map"),
      "plugin UDFs leaked into the caller's function registry")
  }
}
