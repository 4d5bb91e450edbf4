package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Normalized physical-plan fingerprints — the plan-shape regression
  * net. A fingerprint keeps exactly the properties that decide
  * whether a plan survives a 100x scale-up (scan column set + pushed
  * filters, exchange kind and reuse, join strategy + build side,
  * keyed-vs-global windows, TopKPerGroup phases) and drops everything
  * volatile (expression ids, statistics, codegen stage ids, file
  * paths), so the same query produces the same fingerprint on every
  * run and any change to a load-bearing plan property diffs against
  * the checked-in golden (PlanGoldenSpec).
  */
object PlanFingerprint {

  def of(df: DataFrame): String =
    render(unwrap(df.queryExecution.executedPlan), 0).mkString("\n")

  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  private def stripIds(s: String): String =
    s.replaceAll("#\\d+[L]?", "").replaceAll("\\s+", " ").trim

  private def label(p: SparkPlan): String = p match {
    case s: FileSourceScanExec =>
      val pushed = stripIds(s.metadata.getOrElse("PushedFilters", "[]"))
      val table = s.relation.location.rootPaths.headOption
        .map(_.getName.stripSuffix(".parquet")).getOrElse("?")
      s"Scan $table(${s.requiredSchema.fieldNames.mkString(",")}) pushed=$pushed"
    case e: ShuffleExchangeExec =>
      s"Exchange[${e.outputPartitioning.getClass.getSimpleName}]"
    case _: BroadcastExchangeExec => "BroadcastExchange"
    case _: ReusedExchangeExec => "ReusedExchange"
    case j: BroadcastHashJoinExec => s"BroadcastHashJoin(${j.joinType},${j.buildSide})"
    case j: ShuffledHashJoinExec => s"ShuffledHashJoin(${j.joinType},${j.buildSide})"
    case j: SortMergeJoinExec => s"SortMergeJoin(${j.joinType})"
    case j: BroadcastNestedLoopJoinExec => s"BroadcastNestedLoopJoin(${j.joinType})"
    case _: CartesianProductExec => "CartesianProduct"
    case w: WindowExec =>
      if (w.partitionSpec.isEmpty) "Window(GLOBAL)" else "Window(keyed)"
    case t: TopKPerGroupExec =>
      s"TopKPerGroup(${if (t.finalPhase) "final" else "partial"},k=${t.k})"
    case _: WholeStageCodegenExec => "WholeStageCodegen"
    case other => other.nodeName.replaceAll("\\s*\\(\\d+\\)$", "")
  }

  private def render(p: SparkPlan, depth: Int): Seq[String] =
    (("  " * depth) + label(p)) +:
      p.children.flatMap(c => render(c, depth + 1))
}
