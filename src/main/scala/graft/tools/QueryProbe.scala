package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import graft.{GraftSession, SparkEntry}

/** Generic stage-level attribution for one registered query: runs
  * count() (the bench protocol's timed action) with a listener
  * recording every stage's wall span, summed task run/cpu/GC time and
  * shuffle volumes, then prints the top stages by wall — so an
  * optimization round attacks the measured stage, not a guess
  * ([[ResizeProbe]] generalized to the whole registry). Also counts
  * jobs/stages: a query whose wall is dominated by many tiny stages
  * is scheduling/planning-bound, not compute-bound — a different fix
  * (plan-tree truncation) than a hot stage.
  * Usage: runMain graft.tools.QueryProbe <sfDir> <query> [runs]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus, 4]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    case class St(id: Int, tasks: Int, wallMs: Long, runMs: Long,
                  cpuMs: Long, gcMs: Long, shInRec: Long, shOutRec: Long,
                  inRec: Long, nameHint: String)
    val stages = new scala.collection.mutable.ArrayBuffer[St]
    @volatile var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages.synchronized {
          stages += St(i.stageId, i.numTasks,
            i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
            m.executorRunTime, m.executorCpuTime / 1000000,
            m.jvmGCTime, m.shuffleReadMetrics.recordsRead,
            m.shuffleWriteMetrics.recordsWritten,
            m.inputMetrics.recordsRead,
            i.rddInfos.map(_.name).distinct.mkString("|").take(60))
        }
      }
    })
    val fn = SparkEntry.queries(name)
    fn(spark, dir).count() // warm (build caches, codegen, listing)
    for (r <- 1 to runs) {
      System.gc()
      stages.synchronized(stages.clear()); jobs = 0
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      df.queryExecution.executedPlan
      val tPlan = System.nanoTime()
      df.count()
      val wall = (System.nanoTime() - tPlan) / 1e9
      Thread.sleep(300) // let stage-completed events drain
      val ss = stages.synchronized(stages.toVector)
      val taskSec = ss.map(_.runMs).sum / 1e3
      println(f"[probe] $name run$r: plan=${(tPlan - t0) / 1e9}%.2f exec=$wall%.2f s  " +
        f"jobs=$jobs stages=${ss.size} taskTime=$taskSec%.1f s (parallel floor " +
        f"${taskSec / cpus}%.2f s) gc=${ss.map(_.gcMs).sum / 1e3}%.1f s")
      ss.sortBy(-_.wallMs).take(12).foreach { s =>
        println(f"[probe]   stage ${s.id}%4d ${s.tasks}%4d tasks wall=${s.wallMs / 1e3}%6.2f " +
          f"run=${s.runMs / 1e3}%7.1f cpu=${s.cpuMs / 1e3}%7.1f in=${s.inRec}%9d " +
          f"shIn=${s.shInRec}%8d shOut=${s.shOutRec}%8d  ${s.nameHint}")
      }
    }
    spark.stop()
  }
}
