package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.TextAnalytics
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query is deterministic: explicit total-order ORDER BY and
  * floating aggregates rounded, so the DuckDB-oracle hash compare is
  * stable across engines.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The composed MODERN cleanse (round 8) chains the Gopher
    * quality gate, PII counting, normalized dedup, DSIR selection and
    * split assignment in one lazy plan (non-empty at every gate SF —
    * 251 rows at sf0.01; PipeModernSpec pins sf0.001 non-emptiness).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("pipe_modern")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
    operators.TextPipeline.queries ++
    operators.Dedup.queries ++
    operators.BloomDedup.queries ++
    operators.Decontam.queries ++
    operators.Similarity.queries ++
    operators.Multimodal.queries ++
    operators.Sampling.queries ++
    operators.Gossip.queries ++
    operators.Graph.queries ++
    operators.Classifier.queries ++
    operators.Expectations.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    (operators.Relational.oracles ++
     operators.TextPipeline.oracles ++
     operators.Dedup.oracles ++
     operators.BloomDedup.oracles ++
     operators.Decontam.oracles ++
     operators.Similarity.oracles ++
     operators.Multimodal.oracles ++
     operators.Sampling.oracles ++
     operators.Gossip.oracles ++
     operators.Graph.oracles ++
     operators.Classifier.oracles ++
     operators.Expectations.oracles)
      .map { case (k, v) =>
        k -> graft.functions.CrossEngine.expandProundSql(v)
      }
}
