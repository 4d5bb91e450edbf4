package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ScaleOps

/** Empirical proof of `ops_zorder`'s claim: the SAME events written in
  * Z-value order vs time order, split into many small files, read back
  * with a pushed `user_id` predicate. Parquet footer min/max stats let
  * the reader skip whole row groups, and the scan's numOutputRows
  * metric counts exactly the rows that survived that skip (record-level
  * filtering is off by default, the Filter node above re-evaluates) —
  * so the metric IS the pruning measure. Z-layout files are bounded in
  * the user dimension, time-layout files all contain every active user.
  * AQE is disabled for the reads so the executed plan exposes the scan
  * node directly.
  */
class ZOrderPruningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-layout prunes a user_id scan where the time layout reads everything") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val dir = Files.createTempDirectory("zorder_prune").toString
    try {
      val base = graft.sources.Tables.events(spark, sf)
        .select(col("event_id"), col("user_id"),
          (unix_timestamp(date_trunc("hour", col("ts"))) / 3600).cast("long").as("hr"))
      val Seq(uMin, uMax, hMin, hMax) = base.agg(
        min("user_id"), max("user_id"), min("hr"), max("hr"))
        .head.toSeq.map(_.asInstanceOf[Long])
      val n = base.count()
      def q(c: org.apache.spark.sql.Column, lo: Long, hi: Long) =
        floor((c - lit(lo)).cast("double") * 65536d / (hi - lo + 1)).cast("long")
      val z = ScaleOps.zValue(q(col("user_id"), uMin, uMax), q(col("hr"), hMin, hMax))

      val perFile = math.max(1L, n / 16)
      base.repartition(1).sortWithinPartitions(z)
        .write.option("maxRecordsPerFile", perFile)
        .parquet(s"$dir/by_z")
      base.repartition(1).sortWithinPartitions(col("hr"), col("event_id"))
        .write.option("maxRecordsPerFile", perFile)
        .parquet(s"$dir/by_time")

      val probe = uMin // a user guaranteed present
      val zRows = scannedRows(
        spark.read.parquet(s"$dir/by_z").filter(col("user_id") === probe))
      val tRows = scannedRows(
        spark.read.parquet(s"$dir/by_time").filter(col("user_id") === probe))

      // time layout: the probe user is active across the whole month,
      // so every row group survives min/max pruning — full read
      assert(tRows >= n * 9 / 10, s"time layout read $tRows of $n")
      // z layout: files are bounded in the user dimension; a single
      // user intersects only the z-ranges crossing its slab
      assert(zRows * 2 <= tRows, s"z layout read $zRows vs time $tRows")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
