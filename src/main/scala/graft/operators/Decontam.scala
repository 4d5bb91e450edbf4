package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.CrossEngine.{pround, tokens}
import graft.sources.Tables

/** Eval-set decontamination — the 13-gram train/test overlap scan
  * (the GPT-3 / Gopher method) every pretraining pipeline runs before
  * training: any corpus document sharing a 13-gram with the eval set
  * is flagged, with its matching-gram count and contamination ratio,
  * so it can be dropped or scrubbed before the model sees eval
  * answers verbatim.
  *
  * 100 TB shape — the corpus side never shuffles a gram it doesn't
  * have to:
  *  - the per-document distinct-gram DENOMINATOR comes from the
  *    fused [[graft.functions.GramRunStats]] expression (n = 13),
  *    entirely map-side, no gram rows materialized;
  *  - corpus grams stream out of the [[graft.functions.WordNGrams]]
  *    generator and are probed MAP-SIDE against a Bloom sketch of
  *    the eval set's grams (scalar subquery, no false negatives) —
  *    only the maybe-contaminated sliver reaches the exact join, so
  *    join input tracks the true overlap + fpp, not corpus × eval;
  *  - the exact gram join (which removes Bloom false positives)
  *    joins that sliver against the eval gram set — eval sets are
  *    small by nature, so Catalyst broadcasts; if one ever didn't
  *    fit, the shuffle join would still only move the bloom-hit
  *    sliver.
  * The aggregation keys are (doc_id, n_grams): only matched gram
  * rows are ever grouped, so the wide stage is proportional to the
  * contamination found.
  */
object Decontam {

  /** Standard overlap width: 13 consecutive word tokens. */
  val GramWidth = 13

  /** Corpus documents sharing >= 1 `n`-gram with `evalSet`, with the
    * matched distinct-gram count and the contaminated fraction of the
    * document's distinct grams. Both inputs need (doc_id, text).
    * `numBits = 0` auto-sizes the eval-gram Bloom from plan stats
    * (grams overlap, so ~1 gram per 4 source bytes — an
    * overestimate, which only spends bits).
    */
  def contaminated(corpus: DataFrame, evalSet: DataFrame,
                   n: Int = GramWidth, numBits: Long = 0L): DataFrame = {
    val bits =
      if (numBits == 0L) BloomDedup.estimatedBits(evalSet, bytesPerKey = 4L)
      else numBits
    // both sides as 8-byte gram HASHES from the one-pass generator
    // (graft.functions.DistinctGramHashes): the per-doc denominator
    // rides on every corpus row, no gram string is ever built, and
    // the Bloom probes the join key itself. Collision risk is the
    // accepted ~grams²/2⁶⁵ class — the string-keyed DuckDB oracle
    // re-checks the whole computation at every gate run.
    val evalGrams = evalSet
      .select(tokens(col("text")).as("tk"))
      .select(graft.functions.DistinctGramHashes
        .distinct_gram_hashes(col("tk"), n))
      .select(col("gh")).distinct()
    val corpusGrams = corpus
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), graft.functions.DistinctGramHashes
        .distinct_gram_hashes(col("tk"), n))
    corpusGrams
      .where(BloomDedup.probeAgainst(
        evalGrams.select(col("gh").as("k")), "k", bits, col("gh")))
      .join(evalGrams, "gh")
      .groupBy(col("doc_id"), col("n").as("n_grams"))
      .agg(count(lit(1)).as("n_matched"))
      .select(col("doc_id"), col("n_grams"), col("n_matched"),
        pround(col("n_matched") / col("n_grams"), 4).as("contam_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Driver-gate query: eval set = documents with doc_id % 10 = 7
    * (the planted clone structure guarantees real train/eval
    * overlap); corpus = the rest. Lists every contaminated corpus
    * document with its overlap counts.
    */
  def decontamQuery(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    contaminated(docs.filter(col("doc_id") % 10 =!= 7),
                 docs.filter(col("doc_id") % 10 === 7))
  }

  /** Per-SOURCE contamination audit — the dataset-audit view of the
    * 13-gram scan (the `dedup_source_overlap` rationale applied to
    * eval leakage): for every corpus source, how many documents and
    * what fraction (ppm, integer-exact) are contaminated. The answer
    * a curation pass acts on — a source with concentrated leakage is
    * dropped or re-crawled wholesale, not filtered doc by doc.
    * Rides [[decontamQuery]] unchanged (map-side Bloom probe, exact
    * join on the sliver); the audit adds one slim (doc_id, source)
    * projection left-joined against the flagged ids and a per-source
    * aggregate — output is |sources| rows.
    */
  def decontamBySource(s: SparkSession, d: String): DataFrame = {
    val corpus = Tables.documents(s, d).filter(col("doc_id") % 10 =!= 7)
    val flagged = decontamQuery(s, d)
      .select(col("doc_id"), lit(1L).as("is_contam"))
    corpus.select(col("doc_id"), col("source"))
      .join(flagged, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
           sum(coalesce(col("is_contam"), lit(0L))).as("n_contam"))
      .select(col("source"), col("n_docs"), col("n_contam"),
        expr("n_contam * 1000000 div n_docs").as("contam_ppm"))
      .orderBy(col("source"))
  }

  /** Decontamination-aware stratified sampling — the two operators
    * composed as ONE lazy plan, the way a pipeline ships them: the
    * per-language reproducible sample ([[Sampling.stratifiedOf]]) is
    * drawn from the train corpus (eval docs excluded by id), and
    * contaminated documents are removed EXACTLY but cheaply — each
    * sampled doc probes a Bloom sketch of the contaminated-id set
    * map-side; Bloom-clear docs (the overwhelming majority: the
    * contaminated set is small by construction) pass straight
    * through, and only the maybe-contaminated sliver pays the
    * verification anti-join that removes Bloom false positives.
    * Same exactness argument as [[BloomDedup.newDocs]]: no false
    * negatives, so nothing contaminated survives and nothing clean
    * is dropped.
    */
  def decontamSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val excl = decontamQuery(s, d).select(col("doc_id"))
    val flagged = Sampling.stratifiedOf(corpus)
      .withColumn("maybe_contam",
        BloomDedup.probeAgainst(excl.select(xxhash64(col("doc_id")).as("k")),
          "k", 1L << 20, xxhash64(col("doc_id"))))
    val clean = flagged.filter(!col("maybe_contam"))
    val verified = flagged.filter(col("maybe_contam"))
      .join(excl, Seq("doc_id"), "left_anti")
    clean.unionByName(verified)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "txt_decontam" -> decontamQuery _,
    "txt_decontam_src" -> decontamBySource _,
    "smp_decontam" -> decontamSample _,
  )

  private val tokSql =
    "list_filter(regexp_split_to_array(text, '[^\\p{L}]+'), t -> t <> '')"

  /** Shared CTE chain: distinct 13-grams per doc, split into the
    * eval gram set and corpus gram rows.
    */
  private val gramCtes =
    s"""toks AS (SELECT doc_id, $tokSql AS tk FROM documents),
       |idx AS (SELECT doc_id, tk,
       |          unnest(generate_series(1, len(tk) - ${GramWidth - 1})) AS i
       |        FROM toks WHERE len(tk) >= $GramWidth),
       |ng AS (SELECT DISTINCT doc_id,
       |         array_to_string(tk[i:i+${GramWidth - 1}], ' ') AS g
       |       FROM idx),
       |ev AS (SELECT DISTINCT g FROM ng WHERE doc_id % 10 = 7),
       |cg AS (SELECT doc_id, g FROM ng WHERE doc_id % 10 <> 7)""".stripMargin

  val oracles: Map[String, String] = Map(
    // the Bloom probe is pruning only — the exact semantics is the
    // plain distinct-13-gram join DuckDB replays here
    "txt_decontam" ->
      s"""WITH $gramCtes,
         |den AS (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY doc_id)
         |SELECT cg.doc_id, den.n_grams, count(*) AS n_matched,
         |  pround(count(*) / den.n_grams, 4) AS contam_ratio
         |FROM cg JOIN ev ON cg.g = ev.g
         |JOIN den ON den.doc_id = cg.doc_id
         |GROUP BY cg.doc_id, den.n_grams
         |ORDER BY cg.doc_id""".stripMargin,
    "txt_decontam_src" ->
      s"""WITH $gramCtes,
         |contam AS (SELECT DISTINCT cg.doc_id FROM cg JOIN ev ON cg.g = ev.g)
         |SELECT d.source AS source, count(*) AS n_docs,
         |  CAST(count(c.doc_id) AS BIGINT) AS n_contam,
         |  CAST(count(c.doc_id) AS BIGINT) * 1000000 // count(*) AS contam_ppm
         |FROM documents d LEFT JOIN contam c ON c.doc_id = d.doc_id
         |WHERE d.doc_id % 10 <> 7
         |GROUP BY d.source
         |ORDER BY source""".stripMargin,
    // the composed sample: stratified selection minus the exact
    // contaminated-id set (Bloom is pruning only on the Spark side)
    "smp_decontam" ->
      s"""WITH $gramCtes,
         |contam AS (SELECT DISTINCT cg.doc_id FROM cg JOIN ev ON cg.g = ev.g)
         |SELECT doc_id, lang, ${Sampling.stratBucketSql} AS bucket
         |FROM documents
         |WHERE doc_id % 10 <> 7
         |  AND ${Sampling.stratWhereSql}
         |  AND doc_id NOT IN (SELECT doc_id FROM contam)
         |ORDER BY doc_id""".stripMargin,
  )
}
