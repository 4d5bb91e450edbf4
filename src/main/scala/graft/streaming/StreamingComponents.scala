package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** Live maintenance of the near-dup component labels — the streaming
  * twin of the persisted-graph incremental merge (`dedup_components_inc`):
  * each micro-batch of newly ingested documents merges into the frozen
  * dedup-graph state through the SAME delta-proportional pipeline
  * ([[Dedup.componentsIncOverGrams]] — band the batch map-side, probe
  * the persisted rep-level bands, exact-Jaccard-verify the delta
  * candidates, contract the historical graph to super-nodes, relax over
  * the delta only), so label maintenance cost per batch is proportional
  * to the BATCH, never to the corpus.
  *
  * Why `foreachBatch` and not `transformWithState`: component merging
  * is a cross-key GLOBAL operation — one delta edge can unify the
  * labels of two documents living under different grouping keys, and
  * per-key state can never express that union without an iterative
  * shuffle. `foreachBatch` provides exactly that per micro-batch (the
  * contracted-delta label relax is a handful of joins over super-nodes)
  * while keeping the streaming guarantees the stateful operators get
  * from the state store:
  *
  *  - '''exactly-once''': state is VERSIONED — batch `b` reads
  *    `v{b}` and deterministically writes `v{b+1}`, so a replayed
  *    batch after a failure rewrites the same version with the same
  *    bytes instead of double-merging (the write-ahead batchId is the
  *    version number);
  *  - '''bounded state''': the state carries rep-level LSH bands, rep-
  *    level gram HASHES, the frozen band geometry, and the full label
  *    table — no document text is ever retained (a clone-heavy stream
  *    collapses to one representative per distinct text before
  *    signing, the exact-collapse prepass of `dedup_components`).
  *
  * Exactness (StreamingComponentsSpec): after any number of
  * micro-batches, the current labels equal the batch
  * `dedup_components` full recompute over everything ingested so far —
  * including components whose members arrived in DIFFERENT batches and
  * only link transitively — because each merge step is the proven
  * incremental merge and the initial state is the proven index build.
  */
object StreamingComponents {

  private def v(root: String, version: Long): String = s"$root/v$version"

  /** Freeze version 0 of the state from an initial corpus (possibly
    * empty — a stream starting cold). `geom` pins the band geometry
    * for the LIFETIME of this state (the persisted-index contract:
    * every batch must band the way the state it merges into was
    * banded), so size it for the corpus the stream will GROW INTO,
    * not the initial snapshot.
    */
  def init(s: SparkSession, initialDocs: DataFrame, root: String,
           geom: DataFrame): Unit =
    // the index build persists everything the merge needs, including
    // the rep-level gram rows a future delta verifies against (the
    // stream cannot re-shingle text it no longer has)
    Dedup.buildDedupGraphIndex(s, initialDocs, v(root, 0L), geom)

  /** One micro-batch merge: read state `v{batchId}`, merge the batch,
    * write state `v{batchId+1}`. Deterministic in (state, batch), so
    * an at-least-once replay of a batch is idempotent by overwrite.
    */
  private[graft] def applyBatch(batch: DataFrame, root: String,
                                batchId: Long): Unit = {
    val s = batch.sparkSession
    val in = v(root, batchId)
    val out = v(root, batchId + 1)
    val geom = Dedup.loadGraphGeom(s, in)
    val oldLabels = Dedup.loadGraphLabels(s, in)
    val oldBands = Dedup.loadGraphBands(s, in)
    val oldGrams = Dedup.loadGraphGrams(s, in)
    val docs = batch.select(col("doc_id"), col("text"))
    val groups = Dedup.exactGroups(docs)
    val reps = groups.select(col("rep").as("doc_id"), col("text"))
    val newBands = Dedup.minhashBandsOf(reps, geom)
    val newGrams = Dedup.gramHashRowsOf(reps)
    Dedup.componentsIncOverGrams(docs, oldLabels, oldBands, geom,
        oldGrams.unionByName(newGrams))
      .write.mode("overwrite").parquet(s"$out/labels")
    oldBands.unionByName(newBands).write.mode("overwrite")
      .parquet(s"$out/bands")
    oldGrams.unionByName(newGrams).write.mode("overwrite")
      .parquet(s"$out/grams")
    geom.write.mode("overwrite").parquet(s"$out/geom")
  }

  /** Start the maintainer over a document stream `(doc_id, text)`.
    * [[init]] must have frozen `v0` under `root` first.
    */
  def run(stream: Dataset[(Long, String)], root: String,
          checkpoint: String): StreamingQuery =
    stream.toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) => applyBatch(b, root, id) }
      .start()

  /** The highest frozen state version under `root` (v0 = just
    * initialized). Driver-side directory listing — a serving-path
    * helper, never part of a query plan.
    */
  def currentVersion(root: String): Long = {
    val dirs = Option(new java.io.File(root).listFiles()).getOrElse(Array())
    dirs.iterator.map(_.getName)
      .collect { case n if n.matches("v\\d+") => n.drop(1).toLong }
      .foldLeft(0L)(math.max)
  }

  /** The current component labels — the serving surface downstream
    * policies (keep-best, drop lists) read between ingests.
    */
  def labels(s: SparkSession, root: String): DataFrame =
    Dedup.loadGraphLabels(s, v(root, currentVersion(root)))
}
