package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The reference engine's entire query surface, Spark-first.
  *
  * Reference semantics (cited into /root/reference):
  *  - tokenize: `wc/wc.go:26-39` — split on runs of non-letters
  *    (`unicode.IsLetter` predicate at wc.go:28), case-preserving,
  *    Unicode-aware. Java-regex analogue of the separator class is
  *    `[^\p{L}]+`.
  *  - count: `wc/wc.go:44-47` (Reduce = len(values)) composed with the
  *    partial/final merge at `mapreduce/worker.go:218-272` ≡ a
  *    two-phase COUNT per key — exactly Spark's partial/final
  *    HashAggregate, so `groupBy(word).count()` is the whole engine.
  *  - sort: byte-wise key order (`mapreduce/worker.go:24-29`) ≡ Spark's
  *    default binary collation on StringType.
  *  - sink: `"<word> <count>\n"` lines (`mapreduce/worker.go:208`).
  *
  * Scale notes: the reference materializes every value list per key
  * (`worker.go:152,183`); this pipeline never does — partial counts
  * combine map-side, the shuffle carries one (word, count) row per
  * distinct word per partition, and the final sort is a range
  * exchange. At 100 TB the only knob is shuffle partition count /
  * AQE, not code.
  */
object TextAnalytics {

  /** Separator: one-or-more non-letter code points (wc.go:28). */
  val SeparatorRegex = "[^\\p{L}]+"

  /** Corpus as one row per line; `path` column retained for per-file ops. */
  def documents(spark: SparkSession, paths: String*): DataFrame =
    spark.read.text(paths: _*)
      .withColumn("path", input_file_name())
      .withColumnRenamed("value", "text")

  /** Tokenize a text column into one row per token (P1 in SURVEY §2.2).
    *
    * Codegen'd single-pass tokenizer (graft.functions.TokenizeWords) —
    * no UDF, no per-row regex state on the hot path; semantics
    * differential-tested against `split` on [[SeparatorRegex]].
    */
  def tokenize(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(graft.functions.TokenizeWords.tokenize_words(col(textCol)))
      .as("word"))

  /** word -> count over a corpus DataFrame (A1-A5). */
  def wordCount(df: DataFrame, textCol: String = "text"): DataFrame =
    tokenize(df, textCol)
      .groupBy("word")
      .agg(count(lit(1)).as("count"))

  /** Full reference pipeline: paths in, sorted (word, count) out. */
  def wordCountFiles(spark: SparkSession, paths: String*): DataFrame =
    wordCount(documents(spark, paths: _*)).orderBy("word")

  /** Render as the reference's text-sink lines `"<word> <count>"`
    * (S7, worker.go:199-210). Sorted by word in binary order.
    */
  def toOutputLines(counts: DataFrame): Dataset[String] = {
    import counts.sparkSession.implicits._
    counts.orderBy("word")
      .select(concat_ws(" ", col("word"), col("count")))
      .as[String]
  }

  /** Single-file text sink matching `mr-out-final` byte-for-byte
    * (X3 all-to-one merge, worker.go:218-272). coalesce(1) is the
    * deliberate single-writer gather the reference's merge performs;
    * at scale you would keep it partitioned and drop the coalesce.
    */
  def writeCounts(counts: DataFrame, outPath: String): Unit =
    toOutputLines(counts).coalesce(1).write.mode("overwrite").text(outPath)

  /** Parse `"<word> <count>"` sink lines back into (word, count) —
    * P3/P4 in SURVEY §2.2 (mapreduce/worker.go:240-258): empty lines
    * skipped, malformed lines dropped (the reference logs a warning
    * and continues; PERMISSIVE-style tolerance).
    */
  def readCounts(spark: SparkSession, path: String): DataFrame = {
    val parts = split(col("value"), "\\s+")
    spark.read.text(path)
      .filter(length(col("value")) > 0)
      .select(element_at(parts, 1).as("word"),
              // try_cast: malformed counts -> null -> dropped, instead
              // of the ANSI cast error (worker.go:247-253 tolerance)
              element_at(parts, 2).try_cast("long").as("count"))
      .filter(col("count").isNotNull)
  }
}
