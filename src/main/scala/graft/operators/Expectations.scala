package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Declarative data-quality expectations — the validation gate a
  * production ingest runs before any batch enters the corpus (the
  * Great-Expectations/Deequ pattern): each rule is a predicate whose
  * violation count over the batch must be zero, reported as one audit
  * row per rule. [[graft.operators.TextPipeline.driftReport]] watches
  * DISTRIBUTIONS move; this gate catches hard contract breaks —
  * nulls, duplicate keys, enum drift, broken referential links,
  * self-inconsistent derived columns.
  *
  * Scale shape: every per-table rule set folds into ONE map-side
  * partial aggregate over that table (violations are `sum(CASE …)`
  * flags — a single narrow scan per table, no per-rule passes), then
  * `stack`s the one aggregate row into rule rows driver-free. The
  * uniqueness rule rides the same aggregate as
  * `count(*) − count(DISTINCT key)`; the referential rule is the one
  * genuine join (fact keyed against the dimension primary key — at
  * 100 TB a shuffle join on the key, exactly as a production check
  * must). The UNION branches scan DIFFERENT tables, so no subtree is
  * re-evaluated (the lazy-plan UNION rule).
  *
  * The synthetic corpus is clean — every rule passes with zero
  * violations at all gate SFs — so ExpectationsSpec plants nulls,
  * duplicate ids, unknown enums, inconsistent n_chars and orphan
  * orderkeys to prove each rule actually fires.
  */
object Expectations {

  private val KnownLangs = Seq("de", "en", "es", "fr", "zh")
  private val KnownEventTypes =
    Seq("click", "error", "purchase", "signup", "view")

  def expectations(s: SparkSession, d: String): DataFrame =
    expectationsOf(Tables.documents(s, d), Tables.events(s, d),
      Tables.lineitem(s, d), Tables.orders(s, d))

  /** [[expectations]] over explicit frames (spec entry). */
  private[graft] def expectationsOf(docs: DataFrame, events: DataFrame,
                                    lineitem: DataFrame,
                                    orders: DataFrame): DataFrame = {
    val docRules = docs.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("doc_id").isNull, 1L).otherwise(0L)).as("v0"),
      // uniqueness among NON-NULL keys (count(col) skips nulls in both
      // engines) — null keys are doc_id_not_null's finding, not this one's
      (count(col("doc_id")) - countDistinct(col("doc_id"))).as("v1"),
      sum(when(col("lang").isin(KnownLangs: _*), 0L).otherwise(1L)).as("v2"),
      sum(when(length(col("text")) > 0, 0L).otherwise(1L)).as("v3"),
      sum(when(col("n_chars") === length(col("text")), 0L).otherwise(1L))
        .as("v4"))
      .select(lit("documents").as("table_name"), col("n_rows"), expr(
        """stack(5,
          |  'doc_id_not_null', v0, 'doc_id_unique', v1, 'lang_known', v2,
          |  'text_nonempty', v3, 'n_chars_consistent', v4)
          |AS (rule, n_violations)""".stripMargin))
    val evtRules = events.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("ts").isNull, 1L).otherwise(0L)).as("v0"),
      sum(when(col("event_type").isin(KnownEventTypes: _*), 0L).otherwise(1L))
        .as("v1"),
      sum(when(col("value") > 0, 0L).otherwise(1L)).as("v2"),
      sum(when(col("props").isNull, 1L).otherwise(0L)).as("v3"))
      .select(lit("events").as("table_name"), col("n_rows"), expr(
        """stack(4,
          |  'ts_not_null', v0, 'event_type_known', v1,
          |  'value_positive', v2, 'props_not_null', v3)
          |AS (rule, n_violations)""".stripMargin))
    // referential: every fact key must hit the dimension primary key
    // (o_orderkey is the orders PK, so the left join cannot fan out)
    val liRules = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("v0"))
      .select(lit("lineitem").as("table_name"), col("n_rows"), expr(
        "stack(1, 'orderkey_in_orders', v0) AS (rule, n_violations)"))
    docRules.unionByName(evtRules).unionByName(liRules)
      .select(col("table_name"), col("rule"), col("n_rows"),
        col("n_violations"), (col("n_violations") === 0L).as("pass"))
      .orderBy(col("table_name"), col("rule"))
  }

  private val KAnonK = 5L
  private val KAnonSizeBucket = 200L

  /** k-anonymity audit — the privacy-governance complement of
    * txt_pii's content scan: group documents by their quasi-identifier
    * tuple (lang, source, coarse size bucket) and flag every group
    * smaller than k = [[KAnonK]]; a small group means those documents
    * are re-identifiable from metadata alone even with the text
    * scrubbed. One partial-aggregated groupBy — the audit costs a
    * single narrow scan at any corpus size.
    */
  def kanon(s: SparkSession, d: String): DataFrame =
    kanonOf(Tables.documents(s, d))

  /** [[kanon]] over an explicit documents frame (spec entry). */
  private[graft] def kanonOf(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"), col("source"),
        expr(s"n_chars div $KAnonSizeBucket").as("size_bucket"))
      .groupBy(col("lang"), col("source"), col("size_bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("below_k", col("n") < KAnonK)
      .orderBy(col("lang"), col("source"), col("size_bucket"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_expectations" -> expectations _,
    "pipe_kanon"        -> kanon _,
  )

  val oracles: Map[String, String] = Map(
    "pipe_kanon" ->
      s"""WITH q AS (
         |  SELECT lang, source, CAST(n_chars // $KAnonSizeBucket AS BIGINT)
         |      AS size_bucket,
         |    count(*) AS n
         |  FROM documents GROUP BY 1, 2, 3)
         |SELECT lang, source, size_bucket, n, n < $KAnonK AS below_k
         |FROM q ORDER BY lang, source, size_bucket""".stripMargin,
    "pipe_expectations" -> {
      val langs = KnownLangs.map(l => s"'$l'").mkString(",")
      val types = KnownEventTypes.map(t => s"'$t'").mkString(",")
      s"""WITH doc_agg AS (
         |  SELECT count(*) AS n_rows,
         |    CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
         |    count(doc_id) - count(DISTINCT doc_id) AS v_dup,
         |    CAST(sum(CASE WHEN lang IN ($langs) THEN 0 ELSE 1 END) AS BIGINT) AS v_lang,
         |    CAST(sum(CASE WHEN length(text) > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v_empty,
         |    CAST(sum(CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END) AS BIGINT) AS v_chars
         |  FROM documents),
         |evt_agg AS (
         |  SELECT count(*) AS n_rows,
         |    CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_ts,
         |    CAST(sum(CASE WHEN event_type IN ($types) THEN 0 ELSE 1 END) AS BIGINT) AS v_type,
         |    CAST(sum(CASE WHEN value > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v_value,
         |    CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_props
         |  FROM events),
         |li_agg AS (
         |  SELECT count(*) AS n_rows,
         |    CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_ref
         |  FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey),
         |rules AS (
         |  SELECT 'documents' AS table_name, 'doc_id_not_null' AS rule, n_rows, v_null AS n_violations FROM doc_agg
         |  UNION ALL SELECT 'documents', 'doc_id_unique', n_rows, v_dup FROM doc_agg
         |  UNION ALL SELECT 'documents', 'lang_known', n_rows, v_lang FROM doc_agg
         |  UNION ALL SELECT 'documents', 'text_nonempty', n_rows, v_empty FROM doc_agg
         |  UNION ALL SELECT 'documents', 'n_chars_consistent', n_rows, v_chars FROM doc_agg
         |  UNION ALL SELECT 'events', 'ts_not_null', n_rows, v_ts FROM evt_agg
         |  UNION ALL SELECT 'events', 'event_type_known', n_rows, v_type FROM evt_agg
         |  UNION ALL SELECT 'events', 'value_positive', n_rows, v_value FROM evt_agg
         |  UNION ALL SELECT 'events', 'props_not_null', n_rows, v_props FROM evt_agg
         |  UNION ALL SELECT 'lineitem', 'orderkey_in_orders', n_rows, v_ref FROM li_agg)
         |SELECT table_name, rule, n_rows, n_violations,
         |  n_violations = 0 AS pass
         |FROM rules ORDER BY table_name, rule""".stripMargin
    },
  )
}
