package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession

/** Regime probe for the dedup_ngram_prefix twins: a TEMPLATE corpus —
  * every document assembled from a 20-word vocabulary — gives every
  * 3-gram a document frequency in the hundreds, so the AllPairs
  * prefix filter has nothing rare to index (each doc's prefix is
  * itself hot postings) and its candidate stream goes quadratic,
  * while the df cap drops exactly that mass and keeps candidate
  * generation linear. Planted rare-token near-dup pairs (every 500th
  * doc) give both twins a nonzero true answer, found identically.
  *
  * This is the regime the capped twin exists for; the clone-replicated
  * ScaleBench rung is the OTHER degenerate regime (both twins there
  * are bound by the exact-collapse prepass and the expanded pair
  * output, so the cap cannot show a delta). Deterministic text from
  * doc_id arithmetic — no rand(), rerunnable bit-for-bit.
  *
  * Usage: runMain graft.tools.PrefixRegimeProbe [nDocs] [runs]
  */
object PrefixRegimeProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val runs = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus, 4]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vocab = (0 until 20).map(i => s"w$i")
    val vocabArr = array(vocab.map(lit): _*)
    // 40 tokens per doc drawn from the 20-word vocabulary by
    // xxhash64(doc_id, pos) — NONLINEAR in doc_id, so texts are
    // effectively all distinct (any linear index mod 20 cycles with
    // period 20 in doc_id: the first two cuts collapsed to 20
    // distinct texts and both twins drowned in the 10⁹ clone-pair
    // output, measuring nothing) — while every realized 3-gram still
    // lands in hundreds of documents
    val template = concat_ws(" ", (0 until 40).map { p =>
      element_at(vocabArr,
        (pmod(xxhash64(col("doc_id"), lit(p)), lit(20)) + 1).cast("int"))
    }: _*)
    // planted near-dup pairs on rare tokens: docs 500k and 500k+1 are a
    // 30-token unique-vocabulary text and the same text plus one word
    // digits translate to letters: the tokenizer keeps Unicode-letter
    // runs only, so "u15500" would collapse to "u" (one hot gram
    // shared by every planted doc — df above the cap, pairs lost)
    val uniq = concat_ws(" ", (0 until 30).map { p =>
      concat(lit("u"), translate((expr("doc_id div 2") * 31 + p).cast("string"),
        "0123456789", "abcdefghij"))
    }: _*)
    val docs = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") % 500 === 0, uniq)
        .when(col("id") % 500 === 1, concat(uniq, lit(" tail")))
        .otherwise(template).as("text"))
      .withColumn("source", lit("probe"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .localCheckpoint()

    def time(tag: String, f: => Long): Unit = (1 to runs).foreach { _ =>
      val t0 = System.nanoTime()
      val rows = f
      println(f"[regime] $tag%-28s rows=$rows%-8d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("dedup_ngram_prefix_capped",
      graft.operators.Dedup.ngramPrefixCappedOf(docs).count())
    time("dedup_ngram_prefix",
      graft.operators.Dedup.ngramPrefixAdaptiveOf(docs).count())
    spark.stop()
  }
}
