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
  *    version number). A version is only OBSERVABLE once its
  *    `_COMPLETE` marker lands (written last, deleted first on a
  *    replay rewrite), so a reader can never see a partially-written
  *    version — the first cut published `labels` before `bands`, and
  *    a mid-batch read straddled them;
  *  - '''bounded state''': the state carries rep-level LSH bands, rep-
  *    level gram HASHES, the frozen band geometry, and the full label
  *    table — no document text is ever retained (a clone-heavy stream
  *    collapses to one representative per distinct text before
  *    signing, the exact-collapse prepass of `dedup_components`);
  *  - '''delta-proportional I/O''': labels and geometry rewrite per
  *    version (labels change globally under a merge), but bands and
  *    grams — the artifacts that grow with the CORPUS — are written
  *    as per-version DELTAS (this batch's new reps only) and read as
  *    base ∪ deltas. Every [[CompactEvery]] versions the chain folds
  *    into a fresh full base, bounding the read fan-in, and versions
  *    older than the live chain are garbage-collected, bounding disk.
  *    The first cut rewrote the full accumulated state every batch:
  *    O(corpus) I/O per micro-batch and O(corpus × batches) disk.
  *
  * Exactness (StreamingComponentsSpec): after any number of
  * micro-batches, the current labels equal the batch
  * `dedup_components` full recompute over everything ingested so far —
  * including components whose members arrived in DIFFERENT batches and
  * only link transitively — because each merge step is the proven
  * incremental merge and the initial state is the proven index build.
  */
object StreamingComponents {

  /** Fold the bands/grams delta chain into a fresh full base every
    * this many versions — bounds the multi-path read fan-in at the
    * price of one corpus-sized rewrite per window (amortized
    * O(corpus / CompactEvery) per batch).
    */
  private val CompactEvery = 16L

  private def v(root: String, version: Long): String = s"$root/v$version"

  private def markerFile(root: String, version: Long) =
    new java.io.File(v(root, version), "_COMPLETE")

  /** Version `version`'s base: the newest version ≤ it whose
    * bands/grams are FULL (the marker's payload). The state at
    * `version` is base's bands/grams ∪ the deltas of (base, version].
    */
  private[graft] def baseOf(root: String, version: Long): Long = {
    val f = markerFile(root, version)
    require(f.exists(), s"version v$version under $root is not COMPLETE")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong
  }

  private def bandsChain(s: SparkSession, root: String, version: Long): DataFrame =
    s.read.schema("doc_id BIGINT, band BIGINT, sig STRING")
      .parquet((baseOf(root, version) to version)
        .map(k => s"${v(root, k)}/bands"): _*)

  private def gramsChain(s: SparkSession, root: String, version: Long): DataFrame =
    s.read.schema("doc_id BIGINT, gh BIGINT, n BIGINT")
      .parquet((baseOf(root, version) to version)
        .map(k => s"${v(root, k)}/grams"): _*)

  /** Freeze version 0 of the state from an initial corpus (possibly
    * empty — a stream starting cold). `geom` pins the band geometry
    * for the LIFETIME of this state (the persisted-index contract:
    * every batch must band the way the state it merges into was
    * banded), so size it for the corpus the stream will GROW INTO,
    * not the initial snapshot.
    */
  def init(s: SparkSession, initialDocs: DataFrame, root: String,
           geom: DataFrame): Unit = {
    // the index build persists everything the merge needs, including
    // the rep-level gram rows a future delta verifies against (the
    // stream cannot re-shingle text it no longer has)
    Dedup.buildDedupGraphIndex(s, initialDocs, v(root, 0L), geom)
    publish(root, 0L, base = 0L)
  }

  /** Make version `version` observable: write its `_COMPLETE` marker
    * (payload = the version its delta chain is based on) LAST, after
    * every parquet artifact has landed.
    */
  private def publish(root: String, version: Long, base: Long): Unit =
    java.nio.file.Files.write(markerFile(root, version).toPath,
      base.toString.getBytes("UTF-8"))

  /** One micro-batch merge: read state `v{batchId}`, merge the batch,
    * write state `v{batchId+1}`. Deterministic in (state, batch), so
    * an at-least-once replay of a batch is idempotent by overwrite —
    * the replay drops the stale version's marker before touching its
    * artifacts, so the version disappears from readers for the
    * duration of the rewrite instead of serving a half-written mix.
    */
  private[graft] def applyBatch(batch: DataFrame, root: String,
                                batchId: Long): Unit = {
    val s = batch.sparkSession
    val in = v(root, batchId)
    val outVer = batchId + 1
    val out = v(root, outVer)
    markerFile(root, outVer).delete() // stale marker from a crashed run
    val geom = Dedup.loadGraphGeom(s, in)
    val oldLabels = Dedup.loadGraphLabels(s, in)
    val oldBands = bandsChain(s, root, batchId)
    val oldGrams = gramsChain(s, root, batchId)
    val docs = batch.select(col("doc_id"), col("text"))
    val groups = Dedup.exactGroups(docs)
    val reps = groups.select(col("rep").as("doc_id"), col("text"))
    val newBands = Dedup.minhashBandsOf(reps, geom)
    val newGrams = Dedup.gramHashRowsOf(reps)
    Dedup.componentsIncOverGrams(docs, oldLabels, oldBands, geom,
        oldGrams.unionByName(newGrams))
      .write.mode("overwrite").parquet(s"$out/labels")
    val compact = outVer % CompactEvery == 0L
    if (compact) {
      oldBands.unionByName(newBands).write.mode("overwrite")
        .parquet(s"$out/bands")
      oldGrams.unionByName(newGrams).write.mode("overwrite")
        .parquet(s"$out/grams")
    } else {
      newBands.write.mode("overwrite").parquet(s"$out/bands")
      newGrams.write.mode("overwrite").parquet(s"$out/grams")
    }
    geom.write.mode("overwrite").parquet(s"$out/geom")
    publish(root, outVer, base = if (compact) outVer else baseOf(root, batchId))
    gc(root, keepFrom = baseOf(root, batchId))
  }

  /** Drop versions the live chains can never read again. Batch `b`
    * (the one that just wrote v{b+1}) may still REPLAY until its
    * checkpoint commits, and that replay reads v{b}'s chain — so
    * everything from v{b}'s base onward stays; strictly older
    * versions are unreachable from both chains (bases only move
    * forward) and are deleted.
    */
  private def gc(root: String, keepFrom: Long): Unit = {
    val dirs = Option(new java.io.File(root).listFiles()).getOrElse(Array())
    dirs.iterator
      .filter(d => d.getName.matches("v\\d+") &&
                   d.getName.drop(1).toLong < keepFrom)
      .foreach(deleteRecursively)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array()).foreach(deleteRecursively)
    f.delete()
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

  /** The highest COMPLETE frozen state version under `root` (v0 =
    * just initialized) — versions without their `_COMPLETE` marker
    * (mid-write, or a crashed batch's partial output) are invisible.
    * Driver-side directory listing — a serving-path helper, never
    * part of a query plan.
    */
  def currentVersion(root: String): Long = {
    val dirs = Option(new java.io.File(root).listFiles()).getOrElse(Array())
    dirs.iterator.map(_.getName)
      .collect { case n if n.matches("v\\d+") => n.drop(1).toLong }
      .filter(markerFile(root, _).exists())
      .foldLeft(0L)(math.max)
  }

  /** The current component labels — the serving surface downstream
    * policies (keep-best, drop lists) read between ingests.
    */
  def labels(s: SparkSession, root: String): DataFrame =
    Dedup.loadGraphLabels(s, v(root, currentVersion(root)))
}
