package graft.tools

import graft.{GraftSession, SparkEntry}

/** Ad-hoc per-query timing: N runs of each named query with the
  * per-run times printed, for adjudicating bench variance (GC vs JIT
  * vs real). Usage: runMain graft.tools.MicroBench <sfDir> <runs> <q1,q2,...>
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, runsS, names) = args
    val runs = runsS.toInt
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus, 4]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (name <- names.split(',')) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      System.gc()
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // driver-side: analyze + optimize + plan
        val t1 = System.nanoTime()
        df.count()
        ((t1 - t0) / 1e9, (System.nanoTime() - t1) / 1e9)
      }
      println(f"$name%-20s " +
        ts.map { case (p, e) => f"plan $p%.2f + exec $e%.2f" }.mkString(" | "))
    }
    spark.stop()
  }
}
