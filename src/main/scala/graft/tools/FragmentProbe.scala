package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Cold/warm full-evaluation probe: times each named query's
  * noop-sink evaluation twice with a System.gc between, separating
  * one-time costs (page cache, JIT, codegen) from steady plan cost —
  * the protocol that located the round-12 degraded-box interference
  * (BASELINE.md) by showing run-order, not plan shape, drove the
  * swings. Complements MicroBench (count-mode means) and PlanDump
  * (plan text): use this when FULL-evaluation cost needs attributing.
  * Usage: runMain graft.tools.FragmentProbe <sfDir> <q1,q2,...> [alsoAgg]
  * `alsoAgg` additionally times a sort-free single-aggregate consume
  * of each query (isolates the final global sort + output cost).
  *
  * Caveat on multi-query invocations: only the FIRST listed query
  * runs against a genuinely cold JVM/page cache — later queries
  * inherit JIT, codegen caches and file-page warmth from the ones
  * before them, so run1 numbers are cross-query comparable only when
  * each query gets its own JVM invocation. Within one query the
  * run1/run2 split (the probe's purpose) is always valid.
  */
object FragmentProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val names = args(1).split(',')
    val alsoAgg = args.length > 2 && args(2) == "alsoAgg"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus, 4]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 2) {
        System.gc()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[frag] $tag%-28s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    for (n <- names) {
      time(s"$n full")(graft.SparkEntry.queries(n)(spark, d))
      if (alsoAgg) time(s"$n no_sort") {
        val df = graft.SparkEntry.queries(n)(spark, d)
        df.groupBy().agg(count(lit(1)).as("n"),
          sum(crc32(to_json(struct(df.columns.map(col): _*)))).as("chk"))
      }
    }
    spark.stop()
  }
}
