package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CountTokens, DotProduct, FuseTokenCount, NormalizeText, TokenizeWords}

/** SQL-surface registration for the engine's custom Catalyst
  * expressions, so `spark.sql("SELECT tokenize_words(text) ...")`
  * works the same as the Column API.
  *
  * Two entry points:
  *  - `withExtensions(new GraftExtensions)` at session build time
  *    (the SparkSessionExtensions path);
  *  - [[GraftExtensions.register]] to add the functions to an
  *    already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    e.injectOptimizerRule(_ => FuseTokenCount)
    e.injectOptimizerRule(_ => graft.plans.RewriteRankFilterToTopK)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectPlannerStrategy(_ => graft.plans.LazySealStrategy)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("tokenize_words",
      info("tokenize_words", "tokenize_words(str) - maximal runs of Unicode letters"),
      (es: Seq[Expression]) => TokenizeWords(es.head)),
    ("dot_product",
      info("dot_product", "dot_product(a, b) - dot product of two array<double>"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("count_tokens",
      info("count_tokens", "count_tokens(str) - number of letter-run tokens"),
      (es: Seq[Expression]) => CountTokens(es.head)),
    ("normalize_text",
      info("normalize_text",
        "normalize_text(str) - casefold, keep alphanumerics, collapse separators"),
      (es: Seq[Expression]) => NormalizeText(es.head)),
    ("approx_top_k",
      info("approx_top_k",
        "approx_top_k(str, k) - space-saving heavy-hitter summary"),
      (es: Seq[Expression]) => graft.functions.ApproxTopK(es(0),
        es(1).eval().asInstanceOf[Number].intValue)),
    // Spark ships these two for its runtime-filter rewrite but never
    // registers them as SQL functions; exposing them makes the
    // engine's own Bloom machinery a first-class library surface
    // (BloomDedup's cross-run pre-filter builds on them)
    ("bloom_filter_agg",
      info("bloom_filter_agg",
        "bloom_filter_agg(xxhash64(x)[, items[, bits]]) - Bloom filter sketch over LONG hashes"),
      (es: Seq[Expression]) => es.length match {
        case 1 => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(es(0))
        case 2 => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(es(0), es(1))
        case 3 => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(es(0), es(1), es(2))
        case n => throw new org.apache.spark.sql.AnalysisException(
          "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          Map("functionName" -> "`bloom_filter_agg`",
              "expectedNum" -> "[1, 2, 3]", "actualNum" -> n.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
      }),
    ("might_contain",
      info("might_contain",
        "might_contain(bloom, xxhash64(x)) - Bloom membership probe (no false negatives)"),
      (es: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(es(0), es(1))),
  )

  /** Register into an existing session: functions plus the rewrite
    * rules and planner strategy (experimental hooks).
    */
  def register(spark: SparkSession): Unit = {
    registrations.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    if (!spark.experimental.extraOptimizations.contains(FuseTokenCount))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseTokenCount
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RewriteRankFilterToTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteRankFilterToTopK
    if (!spark.experimental.extraStrategies.contains(graft.plans.TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.TopKStrategy
    if (!spark.experimental.extraStrategies.contains(graft.plans.LazySealStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.LazySealStrategy
  }
}
