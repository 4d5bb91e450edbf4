package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary TRAINING — where a merge list like
  * [[graft.functions.BpeTokenizer.merges]] comes from: iteratively
  * take the most frequent adjacent piece pair over the corpus and
  * merge it everywhere, `nMerges` times. The same iterative-driver
  * shape as the Lloyd's k-means trainer (Similarity.trainIvfCentroids):
  * each round is one distributed aggregation plus one scalar driver
  * decision; corpus-sized state never leaves the cluster.
  *
  * Scale shape: training state is one row per distinct lowercased
  * letter-run WORD TYPE (vocabulary-bounded, not corpus-bounded) with
  * its corpus frequency — computed once — and the word's current
  * piece split, kept as the same sentinel-wrapped string
  * representation the tokenizer uses, so applying a merge is one
  * codegen'd `replace` (leftmost non-overlapping — identical
  * semantics to encode time). Pair counting explodes each word type
  * into its adjacent piece pairs weighted by frequency, aggregates,
  * and takes the argmax with a deterministic tiebreak (count desc,
  * then pair lexicographic asc), so training is reproducible on any
  * partitioning.
  */
object BpeTrainer {

  private val L = "\u0002"
  private val R = "\u0003"

  private def wrapChars(c: Column): Column =
    regexp_replace(replace(replace(c, lit(L), lit("")), lit(R), lit("")),
                   "(?s)(.)", s"$L$$1$R")

  /** One row per distinct word type: (pieces string, frequency). */
  private[graft] def wordTypes(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(graft.functions.CrossEngine.tokens(
        lower(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(wrapChars(col("w")).as("ws"), col("freq"))

  /** Train `nMerges` merge rules. Stops early if no adjacent pair is
    * left (every word fused to one piece).
    */
  def train(docs: DataFrame, textCol: String = "text",
            nMerges: Int = 24): Seq[(String, String)] = {
    var state = wordTypes(docs, textCol)
      // vocabulary-sized (not corpus-sized) — cache across iterations,
      // same pattern as the k-means trainer's per-iteration checkpoint
      .cache()
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val arr = split(regexp_replace(col("ws"), s"^$L|$R$$", ""), s"$R$L")
      val top = state
        .select(col("freq"), arr.as("ps"))
        .filter(size(col("ps")) >= 2)
        .select(col("freq"), explode(F.transform(
          sequence(lit(1), size(col("ps")) - 1),
          j => struct(element_at(col("ps"), j).as("a"),
                      element_at(col("ps"), j + 1).as("b")))).as("pr"))
        .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
        .agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = state
          .withColumn("ws", replace(col("ws"),
            lit(s"$L$a$R$L$b$R"), lit(s"$L$a$b$R")))
          .cache()
        next.count() // materialize before dropping the parent
        state.unpersist()
        state = next
      }
      i += 1
    }
    state.unpersist()
    merges.result()
  }
}
