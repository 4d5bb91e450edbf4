package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, lit, when}
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Relational

/** Live MERGE/upsert sink — the streaming twin of the batch
  * `ops_merge_upsert` query (Relational.opsMergeUpsert): a stream of
  * change rows `(key, op, delta_milli)` maintains the post-merge
  * table state incrementally, one micro-batch at a time, instead of
  * re-merging the whole change log per run. This is the shape an
  * incremental corpus-maintenance pipeline actually runs in
  * production: the batch query is the one-shot backfill; this is the
  * per-ingest-batch path.
  *
  * Why `foreachBatch` and not `transformWithState`: the maintained
  * state IS a queryable TABLE (the merge target), and downstream
  * consumers read it between batches — per-key operator state can
  * only emit deltas, not serve the table. `foreachBatch` gives the
  * versioned-table pattern [[StreamingComponents]] established:
  *
  *  - '''exactly-once''': state is VERSIONED — batch `b` reads
  *    `v{b}` and deterministically writes `v{b+1}`, so an
  *    at-least-once replay of batch `b` rewrites the same version
  *    with the same rows instead of double-applying its deltas (the
  *    write-ahead batchId is the version number);
  *  - '''merge = ONE shuffle''': each step is
  *    [[Relational.netChanges]] (map-side-partial, batch-sized) +
  *    one full-outer equi-join on the merge key — the batch query's
  *    exact plan shape, applied to a batch-sized right side that AQE
  *    broadcasts when small;
  *  - '''bounded work per batch''': join cost is |state| + |batch|
  *    scan with a batch-sized build side; nothing is ever
  *    re-derived from history.
  *
  * Action semantics across batches: `action` records each key's
  * relation to the ORIGINAL target (v0) — `keep` (never changed),
  * `insert` (never in v0), `update` (in v0, since modified) — so
  * after any number of batches the state row-equals the one-shot
  * batch merge over the concatenated change log
  * (StreamingMergeSpec), provided each key's net change arrives in
  * one batch (the batch derivation emits one net row per key; a
  * delete followed in a LATER batch by an insert is sequentially
  * re-inserted — CDC order semantics — where the one-shot netting is
  * delete-wins by policy).
  */
object StreamingMerge {

  private val StateSchema = "key LONG, action STRING, bal_milli LONG"

  private def v(root: String, version: Long): String = s"$root/v$version"

  /** Freeze version 0 of the state from the initial merge target
    * `(key, bal_milli)`: every row starts as `keep`.
    */
  def init(target: DataFrame, root: String): Unit =
    target.select(col("key"), lit("keep").as("action"), col("bal_milli"))
      .write.mode("overwrite").parquet(v(root, 0L))

  /** One merge step: current state + one netted change batch → next
    * state. Identical branch semantics to the batch query, with
    * `action` carried forward instead of recomputed (an untouched
    * row keeps its history; a touched row escalates keep→update,
    * while a key never present in v0 stays `insert` no matter how
    * often later batches update it).
    */
  private[graft] def mergeStep(state: DataFrame, changes: DataFrame): DataFrame =
    state.join(Relational.netChanges(changes), Seq("key"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "delete")
      .select(col("key"),
        when(col("op").isNull, col("action"))
          .when(col("action").isNull || (col("action") === "insert"),
            lit("insert"))
          .otherwise(lit("update")).as("action"),
        (coalesce(col("bal_milli"), lit(0L))
          + coalesce(col("delta_milli"), lit(0L))).as("bal_milli"))

  /** Apply one micro-batch: read state `v{batchId}`, merge, write
    * `v{batchId+1}`. Deterministic in (state, batch) — a replayed
    * batchId overwrites its own version with identical rows, never
    * double-applies (StreamingMergeSpec replays it to prove that).
    */
  private[graft] def applyBatch(root: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val state = s.read.schema(StateSchema).parquet(v(root, batchId))
    mergeStep(state, batch)
      .write.mode("overwrite").parquet(v(root, batchId + 1))
  }

  /** Run the maintenance stream: `changes` is a streaming frame of
    * `(key, op, delta_milli)`. Call [[init]] first; read the
    * post-merge table at `root/v{n}` after n batches.
    */
  def run(changes: DataFrame, root: String,
          checkpointDir: String): StreamingQuery =
    changes.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(applyBatch(root) _)
      .start()

  /** Convenience for reading the state a finished stream left. */
  def state(s: SparkSession, root: String, version: Long): DataFrame =
    s.read.schema(StateSchema).parquet(v(root, version))
}
