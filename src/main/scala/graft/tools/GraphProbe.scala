package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, sources}

/** Diagnostic: decompose the registered PageRank's serve cost into
  * its stages on a given corpus — edge cardinality, degree aggregate,
  * one join+reduce round over the persisted cache — and print the
  * round's executed plan. Written for the round-14 calm-day probe
  * where warm serve read 85 s at the 100× rung against a ~15 s
  * expectation.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scaled_100x")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus, 4]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = sources.Tables.lineitem(spark, dir)
    def t[A](tag: String)(run: => A): A = {
      val t0 = System.nanoTime()
      val r = run
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val pairs = li.select((col("l_partkey") * 2).as("p"),
      (col("l_suppkey") * 2 + 1).as("s")).distinct()
    t("pairs.count")(println("[probe]   n_pairs=" + pairs.count()))
    val edges = pairs
      .select(explode(array(
        struct(col("p").as("src"), col("s").as("dst")),
        struct(col("s").as("src"), col("p").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("edges materialize")(println("[probe]   n_edges=" + edges.count()))
    val deg = t("deg plan")(edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg")))
    t("deg.count")(println("[probe]   n_nodes=" + deg.count()))
    val n = li.agg((countDistinct(col("l_partkey")) +
      countDistinct(col("l_suppkey"))).as("n"))
    val init = deg.crossJoin(broadcast(n))
      .select(col("src").as("node"), expr("1000000000000 div n").as("r"),
        col("outdeg"),
        expr("((1000000000000 div n) * 15) div 100").as("base"))
    val round1 = edges.join(init.withColumnRenamed("node", "src"), "src")
      .select(col("dst"), expr("r div outdeg").as("c"), col("base"))
      .groupBy(col("dst"))
      .agg(sum(col("c")).as("sc"), count(lit(1)).as("outdeg"),
        min(col("base")).as("base"))
    t("round1.count")(println("[probe]   round1_rows=" + round1.count()))
    t("round1 again (warm)")(round1.count())
    println(round1.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
