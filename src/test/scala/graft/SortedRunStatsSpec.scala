package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SortedRunStats.sorted_run_stats

/** The fused distinct-count + max-multiplicity pass vs the
  * array_distinct/groupBy forms it replaces in txt_repetition.
  */
class SortedRunStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("matches distinct-size and max multiplicity on hand and random cases") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val cases: Seq[Seq[Long]] =
      Seq(Seq.empty, Seq(7L), Seq(1L, 1L, 2L, 2L, 2L, 3L), Seq.fill(50)(9L)) ++
      (1 to 60).map(_ => Seq.fill(rnd.nextInt(80))(rnd.nextInt(6).toLong))
    val got = cases.toDF("xs")
      .select(sorted_run_stats(array_sort(col("xs"))).as("rs"))
      .select(col("rs.n_distinct"), col("rs.max_rep"))
      .as[(Long, Long)].collect()
    cases.zip(got).foreach { case (xs, (d, m)) =>
      assert(d == xs.distinct.size.toLong, s"distinct for $xs")
      val expectMax =
        if (xs.isEmpty) 0L
        else xs.groupBy(identity).values.map(_.size).max.toLong
      assert(m == expectMax, s"max_rep for $xs")
    }
  }

  test("null elements: nulls group as one distinct value") {
    import spark.implicits._
    val (d, m) = spark.range(1)
      .selectExpr("array(cast(null as bigint), null, 5L, 5L, 5L) as xs")
      .select(sorted_run_stats(col("xs")).as("rs"))
      .select(col("rs.n_distinct"), col("rs.max_rep"))
      .as[(Long, Long)].collect().head
    assert((d, m) == ((2L, 3L)))
  }

  test("stays inside whole-stage codegen") {
    val plan = spark.range(3)
      .selectExpr("array(id, 1L) as xs")
      .select(sorted_run_stats(col("xs")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("rejects non-long arrays at analysis") {
    val e = intercept[Exception] {
      spark.range(1).selectExpr("array('a') as xs")
        .select(sorted_run_stats(col("xs"))).collect()
    }
    assert(e.getMessage.contains("sorted_run_stats"), e.getMessage)
  }
}
