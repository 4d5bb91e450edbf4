package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.LazySeal

/** Pins for the lazy materialization barrier ([[graft.plans.LazySeal]]):
  * value-transparency, build-time laziness (the PlanContractSpec
  * contract for registered queries, asserted here on the primitive
  * directly), once-per-invocation sharing across consumers,
  * self-join deduplication (MultiInstanceRelation) and NESTED seals —
  * the shape that deadlocked the first compute-inside-the-memo-map
  * cut (outer seal's RDD build recursing into the inner seal's
  * rddFor while holding the map's bin lock; jstack-reproduced at the
  * 100× rung on ann_ivf_pq_res).
  */
class LazySealSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def base = {
    val s = spark
    import s.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c"))
      .toDF("id", "k")
  }

  test("seal is value-transparent and lazy at DataFrame build") {
    var jobs = 0
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs += 1 }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val agg = base.groupBy("k").agg(sum("id").as("s"))
      val sld = LazySeal.seal(agg)
      sld.queryExecution.executedPlan // plan it — still no jobs
      Thread.sleep(300) // let any job-start events drain
      assert(jobs === 0, "sealing or planning must not run jobs")
      val exp = agg.orderBy("k").collect().toSeq
      assert(sld.orderBy("k").collect().toSeq === exp)
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("one invocation's consumers share one materialization; a new invocation recomputes") {
    val acc = spark.sparkContext.longAccumulator("sealEvals")
    val s = spark
    import s.implicits._
    val counted = base.filter(udf((id: Long) => { acc.add(1); true })
      .asNondeterministic()(col("id")))
    def invocation(): Long = {
      val sld = LazySeal.seal(counted.groupBy("k").agg(sum("id").as("s")))
      // two consumers of the SAME seal in one plan
      sld.as("l").join(sld.as("r"), Seq("k")).count()
    }
    acc.reset()
    invocation()
    val first = acc.value
    assert(first === base.count(),
      "both join sides must read the one persisted materialization")
    invocation() // NEW seal id — must recompute from source
    assert(acc.value === 2 * first, "nothing may survive an invocation")
  }

  test("nested seals evaluate correctly (the deadlock shape)") {
    val inner = LazySeal.seal(base.groupBy("k").agg(sum("id").as("s")))
    val outerPlan = inner.withColumn("s2", col("s") * 2)
    val outer = LazySeal.seal(outerPlan)
    // both sides of a join on the outer seal, whose sealed plan
    // contains the inner seal: exercises recursive rddFor
    val joined = outer.as("l").join(outer.as("r"), Seq("k"))
      .select(col("k"), (col("l.s2") + col("r.s2")).as("t"))
      .orderBy("k")
    val exp = base.groupBy("k").agg((sum("id") * 4).as("t"))
      .orderBy("k").collect().toSeq
    assert(joined.collect().toSeq === exp)
  }
}
