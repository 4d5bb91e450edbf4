package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders}

/** Fault-injection harness — the Spark-side analogue of the
  * reference's crash test (client.go:309-313: rand%20 == 0 →
  * os.Exit(1) mid-task, recovered by tracker re-execution,
  * tracker.go:153-214). Spark's recovery is lineage + task retry
  * (spark.task.maxFailures) and speculative re-issue
  * (spark.speculation, mirroring tracker.go:14,224,259's 10 s
  * re-issue loop); ChaosSpec uses these injectors to PROVE output
  * invariance under both instead of taking it on faith.
  *
  * Injection is attempt-conditioned via TaskContext, so it is
  * deterministic per attempt — no flaky randomness in the spec.
  */
object Chaos {

  /** Every task of the enclosing stage throws on its first attempt;
    * retries pass through untouched. Inject upstream of a shuffle to
    * exercise map-output re-execution; downstream to exercise
    * reduce-side retry + shuffle refetch.
    */
  def failFirstAttempt(df: DataFrame): DataFrame =
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0)
        throw new RuntimeException(
          s"chaos: injected failure (partition ${tc.partitionId()}, attempt 0)")
      it
    }(Encoders.row(df.schema))

  /** First attempt of each task stalls `ms` before emitting; later
    * attempts (including speculative copies) run at full speed — the
    * straggler shape speculative execution targets.
    */
  def stallFirstAttempt(df: DataFrame, ms: Long): DataFrame =
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0) Thread.sleep(ms)
      it
    }(Encoders.row(df.schema))
}
