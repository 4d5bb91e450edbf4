package graft

/** Ladder probe for [[operators.Graph.pagerankOf]]: times the
  * registered LAZY form (edge list re-derived per round — the
  * oracle-mirrorable plan) against the programmatic
  * `checkpoint = true` form (edge list materialized once with
  * `localCheckpoint`, each round joins the cached RDD) on a scaled
  * lineitem directory. The delta IS the price of keeping the gate
  * query one lazy tree; a production run on a real link graph takes
  * the checkpoint path (see the Graph scaladoc).
  *
  * Usage: runMain graft.GraphScale [dir] [rounds]
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled_100x")
    val rounds = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus, 4]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = sources.Tables.lineitem(spark, dir)
    for (checkpoint <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val top = operators.Graph.pagerankOf(li, rounds, 20, checkpoint)
        .collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"mode":"${if (checkpoint) "checkpoint" else "lazy"}",""" +
        f""""rounds":$rounds,"time_sec":$dt%.2f,"top1":"${top.head.getString(0)}"}""")
      System.gc()
    }
    spark.stop()
  }
}
