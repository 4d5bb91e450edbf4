package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import graft.{GraftSession, SparkEntry}

/** Diagnostic for the mm_resize count-vs-full 20× gap at the 100×
  * rung (round 14): runs the registered query under count() and
  * under the protocol's ordered noop write, with a listener
  * recording per-stage task time, record counts and task failures —
  * so the extra wall-clock is attributed to a concrete stage
  * (sort sample pass? re-executed codec subtree? silent task
  * retries?) instead of guessed at.
  */
object ResizeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled_100x")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus, 4]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var failures = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        if (e.reason.toString != "Success") {
          failures += 1
          if (failures <= 5)
            println(s"[rsz] TASK FAILURE stage=${e.stageId}: ${e.reason.toString.take(300)}")
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val sec = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
        val m = i.taskMetrics
        println(f"[rsz] stage ${i.stageId}%3d ${i.numTasks}%4d tasks ${sec}%8.2f s  " +
          f"run=${m.executorRunTime / 1e3}%8.1f gc=${m.jvmGCTime / 1e3}%6.1f " +
          f"cpu=${m.executorCpuTime / 1e9}%8.1f " +
          f"in=${m.inputMetrics.recordsRead}%9d shIn=${m.shuffleReadMetrics.recordsRead}%9d " +
          f"shOut=${m.shuffleWriteMetrics.recordsWritten}%9d")
        println("[rsz]   rdds: " + i.rddInfos.map(_.name).distinct.mkString(" | ").take(200))
      }
    })
    def t(tag: String)(run: => Unit): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      run
      println(f"[rsz] >>> $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (failures so far: $failures)")
    }
    def q: DataFrame = SparkEntry.queries("mm_resize")(spark, dir)
    if (!args.contains("nowarm")) {
      t("single-thread codec warmup") {
        val png = graft.operators.MediaCodecs.pngBytes(32, 16, 7L)
        (0 until 20000).foreach(_ => graft.operators.MediaCodecs.resizePng(png, 8, 8))
      }
    }
    t("count")(q.count())
    t("noop ordered (protocol)")(q.write.format("noop").mode("overwrite").save())
    t("count 2")(q.count())
    t("noop ordered 2")(q.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
