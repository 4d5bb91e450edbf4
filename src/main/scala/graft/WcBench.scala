package graft

/** BASELINE.md protocol item 3: reference-comparable wall-clock for
  * the word-count pipeline over /root/reference/data (3.44 MB) at
  * local[8] — the reference's own cluster width (8 worker processes).
  */
object WcBench {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect() // JIT warm-up
    val t0 = System.nanoTime()
    val counts = operators.TextAnalytics.wordCountFiles(spark, "/root/reference/data/*.txt")
    val n = counts.count()
    println(f"[wc] distinct=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    val t1 = System.nanoTime()
    operators.TextAnalytics.writeCounts(
      operators.TextAnalytics.wordCount(
        operators.TextAnalytics.documents(spark, "/root/reference/data/*.txt")),
      "/tmp/wc_out")
    println(f"[wc+sink] time=${(System.nanoTime() - t1) / 1e9}%.2f s")
    spark.stop()
  }
}
