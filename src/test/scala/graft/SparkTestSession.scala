package graft

import org.apache.spark.sql.SparkSession

/** One shared session for the whole test run (suites run in one JVM
  * under Test/fork; SparkSession.getOrCreate dedups anyway).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
