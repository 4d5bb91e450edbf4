package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc per-query timing: N runs of each named query with the
  * per-run times printed, for adjudicating bench variance (GC vs JIT
  * vs real). Usage:
  *   runMain graft.tools.MicroBench <sfDir> <runs> <q1,q2,...> [full]
  * `full` times the noop sink (every row and column materialized —
  * the guide §1.4 action) instead of count().
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val (sfDir, runsS, names) = (args(0), args(1), args(2))
    val full = args.length > 3 && args(3) == "full"
    val runs = runsS.toInt
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus, 4]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (name <- names.split(',')) {
      val fn = SparkEntry.queries(name)
      def act(df: org.apache.spark.sql.DataFrame): Unit =
        if (full) df.write.format("noop").mode("overwrite").save()
        else df.count()
      act(fn(spark, sfDir)) // warm
      System.gc()
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // driver-side: analyze + optimize + plan
        val t1 = System.nanoTime()
        act(df)
        ((t1 - t0) / 1e9, (System.nanoTime() - t1) / 1e9)
      }
      println(f"$name%-20s " +
        ts.map { case (p, e) => f"plan $p%.2f + exec $e%.2f" }.mkString(" | "))
    }
    spark.stop()
  }
}
