package graft.plans

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.storage.StorageLevel

/** Whole-operator extension (r14): a LAZY materialization barrier.
  *
  * Iterative plans (label-propagation rounds, Lloyd training rounds)
  * reference their input k times, and Catalyst INLINES the input's
  * whole derivation per reference — the unrolled static tree grows
  * ~k× the pipeline depth (measured: dedup_components formatted to
  * 4.7k lines / 164 Exchanges; dedup_components_inc to 15.9k lines /
  * 460 Exchanges; 0.8–2.6 s of driver planning per run before any
  * task launched). The guide's remedy is "materialise an
  * intermediate" — but both built-in forms are unusable here:
  * `Dataset.localCheckpoint(eager = false)` compiles to an RDD at
  * DataFrame-BUILD time, and under AQE that executes every query
  * stage of the subtree — driver-side jobs at plan build, which
  * PlanContractSpec forbids (a registered query must stay lazy);
  * `persist()` keeps entries in the CacheManager forever (per-
  * invocation caches would leak across a 164-query bench run).
  *
  * LazySeal is the missing primitive: a LEAF logical node carrying
  * the sealed (analyzed) subtree as an opaque FIELD — the optimizer
  * can neither traverse nor rewrite it, so every occurrence stays
  * verbatim-identical — planned by [[LazySealStrategy]] into
  * [[LazySealExec]], whose doExecute (action time, never build time)
  * compiles the sealed plan through its own QueryExecution and
  * memoizes the resulting RDD per seal id: all occurrences inside
  * one invocation share ONE persisted computation. The memo holds
  * WEAK references, so the blocks die with the invocation's RDD
  * graph (ContextCleaner unpersists on GC) — nothing survives a run,
  * no cross-run caching.
  *
  * Use it on SMALL load-bearing intermediates only (pair lists,
  * codebooks, labels): the payload is persisted MEMORY_AND_DISK as
  * deserialized rows — the Graph.scala GC lesson says corpus-sized
  * frames belong in columnar caches or parquet, not here.
  */
case class LazySeal(output: Seq[Attribute], sealedPlan: LogicalPlan,
                    sealId: Long) extends LeafNode
    with org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation {
  // the sealed subtree's stats, so join-side planning above the seal
  // sees the child's size estimate instead of defaultSizeInBytes
  override def computeStats(): org.apache.spark.sql.catalyst.plans.logical.Statistics =
    sealedPlan.stats

  // A sealed frame can land on BOTH sides of one join (e.g. the PQ
  // training sample re-attached to its own narrow argmin):
  // DeduplicateRelations resolves the conflicting attribute ids by
  // asking leaves for a fresh instance. Fresh exprIds, SAME sealId —
  // the memoized RDD is positional, so every instance still shares
  // the one materialization per invocation.
  override def newInstance(): LazySeal =
    copy(output = output.map(_.newInstance()))
}

object LazySeal {
  private val ids = new AtomicLong(0L)

  /** Seal a DataFrame behind a lazy materialization barrier. */
  def seal(df: DataFrame): DataFrame = {
    val plan = ColumnBridge.analyzed(df)
    ColumnBridge.ofRows(df.sparkSession,
      LazySeal(plan.output, plan, ids.incrementAndGet()))
  }
}

object LazySealStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LazySeal(out, sealedPlan, id) => LazySealExec(out, sealedPlan, id) :: Nil
    case _ => Nil
  }
}

case class LazySealExec(output: Seq[Attribute],
                        @transient sealedPlan: LogicalPlan,
                        sealId: Long) extends LeafExecNode {
  // @transient on sealedPlan: physical plans ride into task closures
  // (e.g. a canonicalized BroadcastQueryStage inside the codegen
  // evaluator's reference array), and a LOGICAL plan holds
  // driver-only state (InMemoryFileIndex). Execution only ever
  // touches sealedPlan on the driver (doExecute → rddFor), so the
  // field may vanish in serialized copies — the FileSourceScanExec
  // `@transient relation` pattern.

  protected override def doExecute(): RDD[InternalRow] =
    LazySealExec.rddFor(session, sealedPlan, sealId)

  override def withNewChildrenInternal(
      newChildren: IndexedSeq[SparkPlan]): SparkPlan = this
}

object LazySealExec {
  private val memo =
    new ConcurrentHashMap[Long, java.lang.ref.WeakReference[RDD[InternalRow]]]()

  // Striped reentrant monitors for the compute path: seals NEST (a
  // sealed plan may contain further LazySeal nodes — e.g. the PQ
  // training sample's derivation embeds the sealed coarse
  // assignment), and building the outer seal's RDD graph calls the
  // inner seal's doExecute → rddFor RECURSIVELY. Computing inside
  // ConcurrentHashMap.compute deadlocked there (nested compute on
  // the same map parks on the outer bin's reservation node — a
  // jstack'd, reproduced hang); `synchronized` monitors are
  // reentrant for one thread, and seal nesting is a DAG, so stripe
  // collisions cannot cycle.
  private val stripes = Array.fill(64)(new Object)

  /** One shared RDD per seal id: the sealed plan compiles and runs
    * through its own QueryExecution (AQE and all) the FIRST time any
    * occurrence executes; the rows are defensively copied (exchange
    * iterators reuse row buffers) and persisted so sibling
    * occurrences read blocks instead of recomputing. Weak value ⇒
    * after the invocation's plan is garbage, ContextCleaner drops
    * the blocks; a re-entrant id after collection (never observed —
    * ids are per-DataFrame-build) would simply recompute.
    */
  def rddFor(spark: org.apache.spark.sql.classic.SparkSession,
             sealedPlan: LogicalPlan, id: Long): RDD[InternalRow] = {
    def cached(): RDD[InternalRow] = {
      val ref = memo.get(id)
      if (ref == null) null else ref.get()
    }
    val hit = cached()
    if (hit != null) return hit
    stripes((id % 64).toInt).synchronized {
      val again = cached() // lost the race → reuse the winner's RDD
      if (again != null) again
      else {
        val rdd = spark.sessionState.executePlan(sealedPlan).toRdd
          .map(_.copy())
        rdd.persist(StorageLevel.MEMORY_AND_DISK)
        memo.put(id, new java.lang.ref.WeakReference(rdd))
        rdd
      }
    }
  }
}
