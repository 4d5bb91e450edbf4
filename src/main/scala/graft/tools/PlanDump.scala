package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.FormattedMode

/** Ad-hoc formatted-plan dump for registered queries — the
  * `.explain("formatted")` loop of the plan-shape iteration, runnable
  * without a REPL. Usage: runMain graft.tools.PlanDump <sfDir> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- names.split(',')) {
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
