package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Throwaway-style fragment timing for plan-cost attribution: times
  * named sub-plans of a query under investigation so a regression can
  * be located instead of guessed at. Each measurement runs twice
  * (cold/warm) with a System.gc between, separating one-time costs
  * (page cache, JIT, codegen) from steady plan cost. Edit locally as
  * needed; not part of any contract surface.
  * Usage: runMain graft.tools.FragmentProbe <sfDir>
  */
object FragmentProbe {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus, 4]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 2) {
        System.gc()
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[frag] $tag%-24s run$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }
    }
    time("modern_full")(graft.SparkEntry.queries("pipe_modern")(spark, d))
    time("reasons_full")(graft.SparkEntry.queries("pipe_drop_reasons")(spark, d))
    time("reasons_no_sort") {
      graft.SparkEntry.queries("pipe_drop_reasons")(spark, d)
        .groupBy(col("reason")).count()
    }
    spark.stop()
  }
}
