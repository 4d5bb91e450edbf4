package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole test run (suites run in one JVM
  * under Test/fork; SparkSession.getOrCreate dedups anyway).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4, 4]", shufflePartitions = 4)
      // speculation on for the whole test run: ChaosSpec drives the
      // straggler path under it, and it must be set at context startup
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "100ms")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
