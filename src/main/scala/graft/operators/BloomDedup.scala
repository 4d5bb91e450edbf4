package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Cross-RUN dedup pre-filter — the pattern a 100 TB pipeline uses
  * when today's ingest must be deduplicated against the historical
  * corpus WITHOUT joining the historical corpus: reduce the corpus to
  * a Bloom filter over content hashes (one aggregate, a few bits per
  * document, broadcastable at billions of documents), probe incoming
  * documents map-side, and run the exact verification join only on
  * the "maybe seen" slice.
  *
  * The final [[newDocs]] answer is EXACT, not approximate: Bloom
  * filters have no false negatives, so a `might_contain = false` doc
  * is definitely new and skips the join entirely; the false-positive
  * slice is resolved by an anti-join against the corpus. The filter
  * only decides how much data reaches the join — correctness is
  * oracle-checked like any other query, and the false-positive rate
  * is measured in BloomDedupSpec.
  *
  * Uses Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * (the expressions behind the runtime-filter rewrite), registered as
  * SQL functions by GraftExtensions. `might_contain` requires its
  * sketch to arrive as a constant or scalar subquery, so the
  * aggregate plan is attached as a ScalarSubquery expression (via
  * ColumnBridge) — built inside the plan, evaluated once at query
  * run, job-free at plan build.
  */
object BloomDedup {

  /** Sentinel: derive the sketch size from a count of the corpus. */
  val AutoBits = 0L

  private val MinBits = 65536L        // floor: ~16 bits/doc at sf0.01
  private val MaxBits = 1L << 30      // 128 MiB — still broadcastable
  private val BitsPerKey = 16L        // fpp ≈ 4e-4 at the optimal k

  /** Bloom size for `nKeys` distinct keys at [[BitsPerKey]] bits each,
    * rounded up to a power of two and clamped to [64 Ki, 1 Gi] bits.
    * A fixed size silently saturates at larger corpora (maybe_seen →
    * all-true: still correct, but the pre-filter stops pruning), so
    * the default path sizes from the corpus — mirroring the
    * corpus-adaptive plane count of `Similarity.embedNearDupLsh`.
    */
  def numBitsFor(nKeys: Long): Long =
    if (nKeys >= MaxBits / BitsPerKey) MaxBits  // also guards overflow
    else {
      val want = math.max(MinBits, nKeys * BitsPerKey)
      math.min(MaxBits, java.lang.Long.highestOneBit(math.max(1L, want - 1)) << 1)
    }

  /** Job-free corpus-size estimate: Catalyst's `sizeInBytes` statistic
    * (file-listing metadata for a parquet scan — computed without
    * running anything, so the plan contract "no driver-side jobs at
    * plan build" holds). Keys-per-byte is assumed ≥ 1/64 — documents
    * are at least tens of bytes on disk, so this OVERestimates the
    * key count, which only spends extra sketch bits (fpp can only be
    * better than the [[BitsPerKey]] target). Beyond the 1 Gi-bit
    * broadcast cap (≈ 67 M keys at 16 bits/key) the fpp degrades
    * gracefully and correctness is unaffected — the cap is where a
    * caller should shard the sketch or pass an explicit budget.
    */
  private[graft] def estimatedBits(corpus: DataFrame,
                                       bytesPerKey: Long = 64L): Long = {
    val bytes = corpus.queryExecution.optimizedPlan.stats.sizeInBytes
    val nKeys = (bytes / bytesPerKey).min(BigInt(Long.MaxValue)).toLong
    numBitsFor(math.max(1L, nKeys))
  }

  private def contentKey(c: org.apache.spark.sql.Column) =
    xxhash64(md5(c.cast("binary")))

  private def scalarSubquery(df: DataFrame): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        org.apache.spark.sql.graft.ColumnBridge.analyzed(df)))

  /** A `might_contain` probe column against a Bloom sketch of `keys`
    * (one LONG key column named by `keyCol`), attached as a scalar
    * subquery — the reusable core of every bloom pre-filter in the
    * library (cross-run dedup here, eval-gram decontamination in
    * [[Decontam]]). Build stays job-free; the sketch aggregate runs
    * once when the enclosing query does.
    */
  private[operators] def probeAgainst(keys: DataFrame, keyCol: String,
                                      numBits: Long,
                                      probe: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val bloom = keys.agg(
      expr(s"bloom_filter_agg($keyCol, ${numBits / 8}L, ${numBits}L)").as("bf"))
    org.apache.spark.sql.graft.ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.graft.ColumnBridge.expression(scalarSubquery(bloom)),
        org.apache.spark.sql.graft.ColumnBridge.expression(probe)))
  }

  /** incoming + `maybe_seen` flag against a Bloom sketch of `corpus`
    * (both need a text column). No false negatives; false positives
    * at the sketch's fpp. `numBits = AutoBits` (the default) sizes
    * the sketch from the corpus plan's size statistics — job-free at
    * plan build; pass an explicit size to pin the budget.
    */
  def flagSeen(corpus: DataFrame, incoming: DataFrame,
               numBits: Long = AutoBits): DataFrame = {
    val bits = if (numBits == AutoBits) estimatedBits(corpus) else numBits
    incoming.withColumn("maybe_seen",
      probeAgainst(corpus.select(contentKey(col("text")).as("k")), "k", bits,
        contentKey(col("text"))))
  }

  /** The exact set of incoming documents whose content is NOT in the
    * corpus: Bloom-clear docs pass straight through; only the
    * maybe-seen slice pays the anti-join.
    */
  def newDocs(corpus: DataFrame, incoming: DataFrame,
              numBits: Long = AutoBits): DataFrame = {
    val flagged = flagSeen(corpus, incoming, numBits)
    val definitelyNew = flagged.filter(!col("maybe_seen"))
    val verified = flagged.filter(col("maybe_seen"))
      .join(corpus.select(md5(col("text").cast("binary")).as("__cm5")).distinct(),
            md5(col("text").cast("binary")) === col("__cm5"), "left_anti")
    definitelyNew.unionByName(verified)
  }

  // --- persistent cross-run state ----------------------------------
  // The sketch is the ONLY state a 100 TB pipeline carries between
  // ingest runs (the historical corpus itself stays cold): build it
  // once, persist it, and on the next run load + probe + union-merge
  // with the new batch's sketch. Incremental merging is exact:
  // a Bloom bitset is a pure OR-fold of per-key bit patterns, so
  // sketch(A) | sketch(B) is bit-identical to sketch(A ∪ B) as long
  // as both sides use the same (numBits, numHashFunctions) — which
  // pinning `numBits` guarantees (BloomStateSpec proves byte
  // equality). Serialization is Spark's public
  // `org.apache.spark.util.sketch.BloomFilter` stream format, the
  // same bytes `bloom_filter_agg` aggregates, so a persisted sketch
  // and an in-plan subquery sketch are interchangeable.

  /** Serialized content-key sketch of a corpus: ONE aggregate job,
    * one row collected — a deliberate persistence action, not a
    * hot-path collect (the sketch is ≤ 128 MiB by [[numBitsFor]]'s
    * cap). Pass an explicit `numBits` when the sketch must merge
    * with sketches from other runs.
    */
  def corpusSketch(corpus: DataFrame, numBits: Long = AutoBits): Array[Byte] = {
    val bits = if (numBits == AutoBits) estimatedBits(corpus) else numBits
    corpus.select(contentKey(col("text")).as("k"))
      .agg(expr(s"bloom_filter_agg(k, ${bits / 8}L, ${bits}L)").as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Persist a sketch with its parameters (one-row parquet). */
  def saveSketch(s: SparkSession, path: String, sketch: Array[Byte]): Unit = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bf",
        org.apache.spark.sql.types.BinaryType, nullable = false)))
    s.createDataFrame(
      Seq(org.apache.spark.sql.Row(sketch)).asJava, schema)
      .write.mode("overwrite").parquet(path)
  }

  def loadSketch(s: SparkSession, path: String): Array[Byte] =
    s.read.parquet(path).head().getAs[Array[Byte]]("bf")

  /** OR-union of two sketches. Throws `IncompatibleMergeException`
    * when the sizes/hash counts differ — a silent mixed-parameter
    * merge would quietly break the no-false-negative guarantee.
    */
  def mergeSketches(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val fa = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(a))
    val fb = org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(b))
    fa.mergeInPlace(fb)
    val out = new java.io.ByteArrayOutputStream()
    fa.writeTo(out)
    out.toByteArray
  }

  /** [[flagSeen]] against a PERSISTED sketch instead of an in-plan
    * corpus aggregate: the probe rides a binary literal, so the
    * incoming batch never touches the historical corpus at all.
    * Same contract: no false negatives, fpp per the sketch's sizing.
    */
  def flagSeenSketch(incoming: DataFrame, sketch: Array[Byte]): DataFrame =
    incoming.withColumn("maybe_seen",
      org.apache.spark.sql.graft.ColumnBridge.column(
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.catalyst.expressions.Literal(sketch,
            org.apache.spark.sql.types.BinaryType),
          org.apache.spark.sql.graft.ColumnBridge.expression(
            contentKey(col("text"))))))

  /** Driver-gate query: split `documents` into a corpus (doc_id % 3
    * != 0) and an incoming batch (doc_id % 3 == 0); report the
    * incoming docs whose content the corpus has never seen. The
    * planted clone structure makes the overlap real.
    */
  def bloomNew(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val incoming = docs.filter(col("doc_id") % 3 === 0)
    newDocs(corpus, incoming)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("text_md5"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_bloom_new" -> bloomNew _,
  )

  val oracles: Map[String, String] = Map(
    // the Bloom filter is pruning only — the exact semantics is a
    // plain anti-join, which is what DuckDB replays
    "dedup_bloom_new" ->
      """SELECT i.doc_id, md5(i.text) AS text_md5
        |FROM documents i
        |WHERE i.doc_id % 3 = 0
        |  AND NOT EXISTS (SELECT 1 FROM documents c
        |                  WHERE c.doc_id % 3 <> 0 AND c.text = i.text)
        |ORDER BY i.doc_id""".stripMargin,
  )
}
