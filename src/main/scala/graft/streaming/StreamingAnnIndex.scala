package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Live maintenance of the persisted IVF-PQ index — the
  * [[StreamingComponents]] pattern applied to the ANN serving state
  * (`ann_ivf_pq_idx`): each micro-batch of newly ingested vectors
  * assigns to the FROZEN coarse lists map-side (one broadcast-centroid
  * ranking pass — assignment is stateless per vector, so incremental
  * batches compose exactly with the one-shot build), PQ-encodes
  * against the FROZEN codebooks, and appends 4-byte codes + coarse
  * assignments as a per-version DELTA. Per-batch cost is proportional
  * to the BATCH; the historical corpus is never re-encoded and raw
  * vectors never enter the state.
  *
  * Versioning/atomicity/compaction/GC are the [[StreamingComponents]]
  * contract verbatim: batch `b` reads `v{b}`'s chain and
  * deterministically writes `v{b+1}` (replay = idempotent overwrite);
  * a version is observable only once its `_COMPLETE` marker (payload
  * = chain base) lands; every [[CompactEvery]] versions the delta
  * chain folds into a fresh full base; versions below the live chain
  * are deleted.
  *
  * '''Drift and retraining''': a frozen coarse quantizer slowly stops
  * explaining a shifting stream. Every batch persists a one-row stats
  * delta — (n, Σ⌊best-centroid cos · 10⁶⌋, per-list max) — the numbers
  * the assignment pass yields for free (see `annIvfPqRes`'s residual
  * identity: mean ‖residual‖² = 2·(1 − mean best-centroid cos), so
  * falling mean cos IS rising residual norm). [[drift]] reduces the
  * chain to three live metrics: mean-cos drop since training,
  * coarse-list skew (max list size / mean), and growth since
  * training; [[needsRetrain]] thresholds them, and [[retrain]] writes
  * a fresh full build (new centroids sized to the GROWN corpus — the
  * in-plan √N stride) as the next version, which becomes the new
  * chain base. StreamingAnnIndexSpec pins stream == batch-recompute
  * search parity on closed batches, bounded/text-free state, the
  * drift trigger, and replay idempotency.
  */
object StreamingAnnIndex {

  private val CompactEvery = 16L

  private def v(root: String, version: Long): String = s"$root/v$version"

  private def markerFile(root: String, version: Long) =
    new java.io.File(v(root, version), "_COMPLETE")

  private[graft] def baseOf(root: String, version: Long): Long = {
    val f = markerFile(root, version)
    require(f.exists(), s"version v$version under $root is not COMPLETE")
    new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.toLong
  }

  private def publish(root: String, version: Long, base: Long): Unit =
    java.nio.file.Files.write(markerFile(root, version).toPath,
      base.toString.getBytes("UTF-8"))

  private def codesChain(s: SparkSession, root: String, version: Long): DataFrame =
    s.read.schema("vec_id BIGINT, m INT, kid BIGINT")
      .parquet((baseOf(root, version) to version)
        .map(k => s"${v(root, k)}/codes"): _*)

  private def coarseChain(s: SparkSession, root: String, version: Long): DataFrame =
    s.read.schema("vec_id BIGINT, cid BIGINT")
      .parquet((baseOf(root, version) to version)
        .map(k => s"${v(root, k)}/coarse"): _*)

  /** Per-version assignment stats: rows of (cid, n, sum_ccos_micro);
    * `is_train` marks the base row written at build/retrain time (the
    * "since training" reference the drift compares against).
    */
  private def statsChain(s: SparkSession, root: String, version: Long): DataFrame =
    s.read.schema("cid BIGINT, n BIGINT, sum_ccos_micro BIGINT, is_train BOOLEAN")
      .parquet((baseOf(root, version) to version)
        .map(k => s"${v(root, k)}/stats"): _*)

  private def centsOf(s: SparkSession, root: String, base: Long): DataFrame =
    Similarity.loadCentroids(s, s"${v(root, base)}/centroids")
      .withColumn("cnrm",
        sqrt(graft.functions.DotProduct.dot_product(col("cv"), col("cv"))))

  private def statsOf(assign: DataFrame, isTrain: Boolean): DataFrame =
    assign.groupBy(col("cid"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("ccos") * lit(1000000d) + lit(0.5)).cast("long"))
          .as("sum_ccos_micro"))
      .withColumn("is_train", lit(isTrain))

  /** Write version `ver` as a FULL base build from `raw`
    * (vec_id, embedding): centroids + codebooks train on this corpus
    * (√N stride), codes/coarse are full, stats carry the is_train
    * reference row set. Shared by [[init]] (ver 0) and [[retrain]].
    */
  private def writeBase(s: SparkSession, raw: DataFrame, root: String,
                        ver: Long): Unit = {
    val out = v(root, ver)
    markerFile(root, ver).delete()
    val e = Similarity.vectorsOf(raw)
    Similarity.buildIvfPqIndexOf(e, out)
    statsOf(Similarity.assignWithCentroids(e, centsOf(s, root, ver)),
        isTrain = true)
      .write.mode("overwrite").parquet(s"$out/stats")
    publish(root, ver, base = ver)
  }

  /** Freeze version 0 from the initial corpus. The initial corpus
    * must be non-empty — an IVF quantizer cannot train on nothing
    * (a stream starting cold seeds with its first bootstrap batch).
    */
  def init(s: SparkSession, initialRaw: DataFrame, root: String): Unit =
    writeBase(s, initialRaw, root, 0L)

  /** One micro-batch merge: assign + encode the batch against the
    * chain base's frozen centroids/codebooks, append deltas as
    * `v{batchId+1}`. Deterministic in (state, batch) — replay is
    * idempotent by overwrite.
    */
  private[graft] def applyBatch(batch: DataFrame, root: String,
                                batchId: Long): Unit = {
    val s = batch.sparkSession
    val outVer = batchId + 1
    val out = v(root, outVer)
    markerFile(root, outVer).delete()
    val base = baseOf(root, batchId)
    val cents = centsOf(s, root, base)
    val cb = Similarity.loadPqCodebooks(s, s"${v(root, base)}/codebooks")
    val e = Similarity.vectorsOf(batch)
    val en = e.select(col("vec_id"),
      transform(col("v"), x => x / col("nrm")).as("v"))
    val assign = Similarity.assignWithCentroids(e, cents)
    val newCodes = Similarity.pqEncodeWith(en, cb)
    val newCoarse = assign.select(col("vec_id"), col("cid"))
    val newStats = statsOf(assign, isTrain = false)
    val compact = outVer % CompactEvery == 0L
    if (compact) {
      codesChain(s, root, batchId).unionByName(newCodes)
        .write.mode("overwrite").parquet(s"$out/codes")
      coarseChain(s, root, batchId).unionByName(newCoarse)
        .write.mode("overwrite").parquet(s"$out/coarse")
      statsChain(s, root, batchId).unionByName(newStats)
        .write.mode("overwrite").parquet(s"$out/stats")
      // geometry is FROZEN across a compaction: carry the base's
      // centroids/codebooks forward so the folded version is
      // self-contained (a retrain, not a compaction, changes them)
      Similarity.loadCentroids(s, s"${v(root, base)}/centroids")
        .write.mode("overwrite").parquet(s"$out/centroids")
      Similarity.loadPqCodebooks(s, s"${v(root, base)}/codebooks")
        .write.mode("overwrite").parquet(s"$out/codebooks")
    } else {
      newCodes.write.mode("overwrite").parquet(s"$out/codes")
      newCoarse.write.mode("overwrite").parquet(s"$out/coarse")
      newStats.write.mode("overwrite").parquet(s"$out/stats")
    }
    publish(root, outVer, base = if (compact) outVer else base)
    gc(root, keepFrom = base)
  }

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

  /** Start the maintainer over a vector stream `(vec_id, embedding)`.
    * [[init]] must have frozen `v0` under `root` first.
    */
  def run(stream: Dataset[(Long, Array[Double])], root: String,
          checkpoint: String): StreamingQuery =
    stream.toDF("vec_id", "embedding")
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) => applyBatch(b, root, id) }
      .start()

  /** The highest COMPLETE version (the serving surface's read point). */
  def currentVersion(root: String): Long = {
    val dirs = Option(new java.io.File(root).listFiles()).getOrElse(Array())
    dirs.iterator.map(_.getName)
      .collect { case n if n.matches("v\\d+") => n.drop(1).toLong }
      .filter(markerFile(root, _).exists())
      .foldLeft(0L)(math.max)
  }

  /** IVF-PQ search against the maintained index. `raw` is the vector
    * lake (vec_id, embedding) — probes and the shortlist re-rank read
    * raw vectors from the LAKE, codes/lists/centroids from the index,
    * exactly like the persisted-index serving twin `ann_ivf_pq_idx`.
    */
  def search(s: SparkSession, raw: DataFrame, root: String): DataFrame = {
    val ver = currentVersion(root)
    val base = baseOf(root, ver)
    Similarity.ivfPqSearchFrom(Similarity.vectorsOf(raw),
      Similarity.loadPqCodebooks(s, s"${v(root, base)}/codebooks"),
      codesChain(s, root, ver),
      coarseChain(s, root, ver),
      centsOf(s, root, base))
  }

  /** Live drift metrics of the maintained index, reduced from the
    * persisted stats chain: one row —
    *  - `n_train` / `mean_ccos_train_x1e6`: corpus size and mean
    *    best-centroid cosine AT TRAINING TIME (the is_train rows);
    *  - `n_since` / `mean_ccos_since_x1e6`: the same over every batch
    *    ingested since;
    *  - `list_skew_x1000`: max coarse-list size / mean list size over
    *    the CURRENT lists (train + deltas combined);
    *  - `growth_x1000`: (n_train + n_since) / n_train.
    */
  def drift(s: SparkSession, root: String): DataFrame = {
    val ver = currentVersion(root)
    val st = statsChain(s, root, ver)
    val lists = st.groupBy(col("cid")).agg(sum(col("n")).as("ln"))
      .agg(max(col("ln")).as("mx"), avg(col("ln")).as("av"))
      .select(floor(col("mx") / col("av") * lit(1000d) + lit(0.5))
        .cast("long").as("list_skew_x1000"))
    val tr = st.groupBy(col("is_train"))
      .agg(sum(col("n")).as("n"), sum(col("sum_ccos_micro")).as("sc"))
    val tright = tr.filter(col("is_train"))
      .select(col("n").as("n_train"),
        (col("sc") / col("n")).cast("long").as("mean_ccos_train_x1e6"))
    val tsince = tr.filter(!col("is_train"))
      .select(col("n").as("n_since"),
        (col("sc") / col("n")).cast("long").as("mean_ccos_since_x1e6"))
    tright.crossJoin(broadcast(coalesceEmpty(tsince)))
      .crossJoin(broadcast(lists))
      .withColumn("growth_x1000",
        floor((col("n_train") + col("n_since"))
          / col("n_train") * lit(1000d) + lit(0.5)).cast("long"))
  }

  /** An all-train chain has no since rows; serve zeros, not an empty
    * frame (the cross-join would erase the train row).
    */
  private def coalesceEmpty(tsince: DataFrame): DataFrame = {
    val s = tsince.sparkSession
    import s.implicits._
    val zero = Seq((0L, 0L)).toDF("n_since", "mean_ccos_since_x1e6")
    tsince.unionByName(zero)
      .orderBy(col("n_since").desc).limit(1)
  }

  /** Threshold the [[drift]] metrics — driver-side serving helper.
    * Retrain when the mean best-centroid cosine of post-training
    * batches has dropped more than `maxCosDrop` below the training
    * reference (rising residual norm), when any coarse list has
    * grown past `maxSkew`× the mean (degenerate probe cost), or when
    * the corpus has outgrown the √n_train centroid budget by
    * `maxGrowth`×.
    */
  def needsRetrain(s: SparkSession, root: String,
                   maxCosDrop: Double = 0.10,
                   maxSkew: Double = 4.0,
                   maxGrowth: Double = 4.0): Boolean = {
    val r = drift(s, root).collect().head
    val drop = (r.getAs[Long]("mean_ccos_train_x1e6") -
      r.getAs[Long]("mean_ccos_since_x1e6")) / 1e6
    val skew = r.getAs[Long]("list_skew_x1000") / 1e3
    val growth = r.getAs[Long]("growth_x1000") / 1e3
    (r.getAs[Long]("n_since") > 0 && drop > maxCosDrop) ||
      skew > maxSkew || growth > maxGrowth
  }

  /** Full rebuild over the grown corpus — new centroids (√N stride
    * over the grown N), new codebooks, full re-encode — REWRITING the
    * current version in place as a fresh chain base; the stream then
    * resumes appending deltas on top. Rewriting in place (not
    * appending a version) keeps the version↔batchId bijection the
    * exactly-once replay contract rides on: stream batch `b` always
    * writes `v{b+1}`, and after a retrain the next batch's
    * `baseOf(v{b})` simply reads the new base. This is a QUIESCED-
    * STREAM maintenance operation (stop the query or drain it with
    * processAllAvailable first — an in-flight batch replay would
    * overwrite the rebuild with its delta); readers degrade to the
    * previous complete version for the rewrite's duration (the
    * marker drops first, and GC always keeps the prior chain).
    * `raw` is the vector lake — the state never kept raw vectors, so
    * the retrain reads the lake, the same I/O contract as the
    * one-shot build it repeats.
    */
  def retrain(s: SparkSession, raw: DataFrame, root: String): Unit = {
    val ver = currentVersion(root)
    writeBase(s, raw, root, ver)
    gc(root, keepFrom = ver)
  }
}
