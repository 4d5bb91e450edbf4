package graft

/** Ladder probe for the PageRank plan variants: the LAZY form (edge
  * list re-derived per round — the oracle-mirrorable unrolled tree),
  * the `localCheckpoint` form (deserialized RDD blocks — measured as
  * a GC collapse at the 100× rung, kept timeable for the record),
  * and the registered PERSIST form (columnar-compressed cache, round
  * 13) timed twice — run1 pays the cache build, run2 is the warm
  * serving cost.
  *
  * Usage: runMain graft.GraphScale [dir] [rounds] [modesCsv]
  * modes: lazy | checkpoint | persist (default: lazy,persist — the
  * localCheckpoint mode only on request, it can eat minutes of GC).
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled_100x")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val modes = (if (args.length > 2) args(2) else "lazy,persist")
      .split(",").toSet
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus, 4]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = sources.Tables.lineitem(spark, dir)
    def time(mode: String)(run: => org.apache.spark.sql.Row): Unit = {
      val t0 = System.nanoTime()
      val top = run
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"mode":"$mode","rounds":$rounds,""" +
        f""""time_sec":$dt%.2f,"top1":"${top.getString(0)}"}""")
      System.gc()
    }
    for (checkpoint <- Seq(false, true)
         if modes(if (checkpoint) "checkpoint" else "lazy"))
      time(if (checkpoint) "checkpoint" else "lazy") {
        operators.Graph.pagerankOf(li, rounds, 20, checkpoint).collect().head
      }
    if (modes("persist"))
      for (i <- 1 to 2)
        time(s"persist_run$i") {
          operators.Graph.pagerank(spark, dir).collect().head
        }
    spark.stop()
  }
}
