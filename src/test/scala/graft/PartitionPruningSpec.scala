package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScaleOps
import graft.sources.Tables

/** Directory-level partition pruning must be REAL: a predicate on
  * the partition column reaches the scan as a PartitionFilter and
  * the scan opens only the matching `lang=…/` directories' files —
  * proven on actual file counts, not plan text alone.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("a partition-column predicate scans only its directories") {
    val dir = java.nio.file.Files.createTempDirectory("partdocs").toString
    val docs = Tables.documents(spark, sf)
    ScaleOps.writePartitioned(
      docs.select(col("doc_id"), col("text"), col("lang")), dir, "lang")

    val langs = docs.select(col("lang")).distinct().count()
    assert(langs > 1, "corpus must have several languages for the test to bite")

    val all = spark.read.parquet(dir)
    val one = all.filter(col("lang") === "en")

    // the predicate must be a partition filter, not a data filter
    val scan = one.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in the plan"))
    val meta = scan.metadata("PartitionFilters")
    assert(meta.contains("lang"), s"predicate not pushed to partitions: $meta")

    // and it must bind: the pruned scan opens strictly fewer files.
    // collect() drives THIS DataFrame's QueryExecution (a write
    // action plans a fresh one whose metrics we could not see)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val executed = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      executed.collectFirst {
        case f: FileSourceScanExec => f.metrics("numFiles").value
      }.getOrElse(fail("no scan metrics"))
    }
    val prunedFiles = filesRead(one)
    val allFiles = filesRead(all)
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"pruning did not bind: $prunedFiles of $allFiles files")

    // and results are exactly the partition's rows
    assert(one.count() == docs.filter(col("lang") === "en").count())
  }
}
