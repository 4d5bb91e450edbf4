package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScaleOps
import graft.sources.Tables

/** Physical-layout contracts: bucketed joins shuffle nothing, salted
  * joins change distribution but not results.
  */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without a shuffle exchange") {
    for (t <- Seq("li_bucketed", "ord_bucketed")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    ScaleOps.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "li_bucketed", "l_orderkey", 4)
    ScaleOps.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "ord_bucketed", "l_orderkey", 4)
    // hint merge: at test size the planner would broadcast (which
    // also shuffles nothing, but hides the bucketed-scan path we are
    // asserting — at scale both sides are too big to broadcast)
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("ord_bucketed"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("ShuffleExchange"), plan)
    assert(joined.count() > 0)
  }

  test("distributed gapRanges equals the global-window form, with no single-partition window") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.execution.window.WindowExec
    // deterministic gapped id set: multiples dropped + a few runs removed
    val ids = spark.range(1, 20001).toDF("id")
      .filter(col("id") % 97 =!= 0)
      .filter(!col("id").between(5000, 5120) && !col("id").between(19990, 20000))
      .union(spark.range(1, 50).toDF("id")) // duplicates must not matter
    val got = ScaleOps.gapRanges(ids, "id", startId = Some(1L))
    val w = Window.orderBy(col("id"))
    val want = ids.select(col("id").cast("long").as("id")).distinct()
      .withColumn("prev", coalesce(lag(col("id"), 1).over(w), lit(0L)))
      .filter(col("id") - col("prev") > 1)
      .select((col("prev") + 1).as("gap_start"), (col("id") - 1).as("gap_end"))
    assert(got.collect().toSeq.sortBy(_.getLong(0)) ===
           want.collect().toSeq.sortBy(_.getLong(0)))
    val globalWindows = got.queryExecution.executedPlan.collect {
      case we: WindowExec if we.partitionSpec.isEmpty => we
    }
    assert(globalWindows.isEmpty, "gap scan must not plan a global-order window")
    // leading hole [1, first-1] is reported when startId is set
    val lead = ScaleOps.gapRanges(spark.range(10, 15).toDF("id"), "id", Some(1L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lead.head === (1L, 9L))
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // The 100 TB knob: a selective dimension-side predicate becomes a
    // bloom filter applied at the fact scan, cutting shuffle input
    // before the join. Size thresholds are tuned for a cluster
    // (application side >= 10 GB), so the spec lowers them to prove
    // the plan shape at test SF; the rewrite itself is Catalyst's.
    val restore = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val l = Tables.lineitem(spark, sf)
      val o = Tables.orders(spark, sf).filter(col("o_totalprice") > 200000)
      val j = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"), plan)
      assert(j.count() > 0)
    } finally restore.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("distributed prefixSum equals the global-window running sum") {
    import org.apache.spark.sql.expressions.Window
    val df = Tables.orders(spark, sf)
      .select(col("o_orderkey"), (col("o_totalprice") * 0 + 1).cast("long").as("one"),
              col("o_custkey"))
    val expected = df.withColumn("cum",
        sum(col("o_custkey")).over(Window.orderBy(col("o_orderkey"))))
      .select(col("o_orderkey"), col("cum"))
    val got = ScaleOps.prefixSum(df, "o_orderkey", "o_custkey", "cum", buckets = 7)
      .select(col("o_orderkey"), col("cum"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    // and the distributed form must not plan a global window
    val globals = got.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(globals.isEmpty)
  }

  test("sortedPercentiles == built-in percentile(), ties included") {
    import spark.implicits._
    // group a: 7 values incl. a TIE spanning the p50 interpolation
    //   indices (both order statistics = 3.0 → the value-equality
    //   short-circuit path, not the weight arithmetic);
    // group b: 4 distinct values → real interpolation at every p;
    // group c: singleton (pos = 0 at every percentile)
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 3.0), ("a", 3.0),
      ("a", 9.0), ("a", 10.0),
      ("b", 1.0), ("b", 2.0), ("b", 4.0), ("b", 8.0),
      ("c", 5.0)).toDF("k", "v")
    val ps = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    val got = ScaleOps.sortedPercentiles(df, "k", "v", ps)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val ref = df.groupBy(col("k"))
      .agg(expr("percentile(v, 0.5)").as("p50"),
           expr("percentile(v, 0.9)").as("p90"),
           expr("percentile(v, 0.99)").as("p99"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got == ref, s"got $got vs built-in $ref")
  }

  test("weightedPercentiles == built-in percentile on the expanded rows") {
    import spark.implicits._
    // (value, weight) with a heavy value so interpolation indices land
    // INSIDE one row's cumulative interval (short-circuit) and between
    // rows (real interpolation) across the three percentiles
    val freq = Seq((1L, 3L), (2L, 10L), (5L, 2L), (7L, 1L))
      .toDF("v", "w")
    val expanded = freq.as[(Long, Long)].collect()
      .flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.toSeq.toDF("v")
    val ps = Seq(0.5 -> "p50", 0.9 -> "p90", 0.99 -> "p99")
    val got = ScaleOps.weightedPercentiles(freq, "v", "w", ps)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val ref = expanded
      .agg(expr("percentile(v, 0.5)"), expr("percentile(v, 0.9)"),
           expr("percentile(v, 0.99)"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == ref.toSeq, s"got ${got.toSeq} vs ${ref.toSeq}")
    // and no global window anywhere in the plan
    val globals = ScaleOps.weightedPercentiles(freq, "v", "w", ps)
      .queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
    assert(globals.isEmpty)
  }

  test("weightedPercentiles is exact for FRACTIONAL values sharing a long") {
    import spark.implicits._
    // 2.25, 2.5, 2.75 all truncate to long 2 — under the old
    // __ord-ordered window they were RANGE-frame peers sharing one
    // cumulative sum, corrupting the covers() interval partition.
    // The raw-value ordering must keep them distinct rows.
    val freq = Seq((0.5, 2L), (2.25, 3L), (2.5, 4L), (2.75, 2L), (9.5, 1L))
      .toDF("v", "w")
    val expanded = freq.as[(Double, Long)].collect()
      .flatMap { case (v, w) => Seq.fill(w.toInt)(v) }.toSeq.toDF("v")
    val ps = Seq(0.25 -> "p25", 0.5 -> "p50", 0.75 -> "p75")
    val got = ScaleOps.weightedPercentiles(freq, "v", "w", ps)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val ref = expanded
      .agg(expr("percentile(v, 0.25)"), expr("percentile(v, 0.5)"),
           expr("percentile(v, 0.75)"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSeq == ref.toSeq, s"got ${got.toSeq} vs ${ref.toSeq}")
  }

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val o = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val plain = li.join(o, "k")
    val salted = ScaleOps.saltedJoin(li, o, "k", nSalts = 8)
    assert(plain.count() == salted.count())
    assert(plain.except(salted).isEmpty && salted.except(plain).isEmpty)
  }
}
