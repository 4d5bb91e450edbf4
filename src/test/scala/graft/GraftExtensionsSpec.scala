package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL registration path for the custom expressions. */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("custom expressions are callable from SQL after register()") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val row = spark.sql(
      """SELECT tokenize_words('don''t stop-me 123 ϰητος') AS toks,
        |       dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp
        |""".stripMargin)
      .as[(Seq[String], Double)].head()
    assert(row._1 == Seq("don", "t", "stop", "me", "ϰητος"))
    assert(row._2 == 11.0)
  }

  test("FuseTokenCount rewrites size(tokenize_words(x)) to count_tokens") {
    GraftExtensions.register(spark)
    import org.apache.spark.sql.functions._
    import graft.functions.TokenizeWords.tokenize_words
    val df = spark.range(3)
      .select(concat(lit("a b c"), col("id")).as("text"))
      .select(size(tokenize_words(col("text"))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("counttokens"), optimized)
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(3, 3, 3))
    // and the unfused + fused forms agree on real data
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val a = docs.select(size(graft.functions.CrossEngine.tokens(col("text"))).as("n"))
    val b = docs.selectExpr("count_tokens(text) AS n")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("bloom_filter_agg rejects a wrong argument count cleanly") {
    GraftExtensions.register(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT bloom_filter_agg() FROM range(1)").collect()
    }
    assert(e.getMessage.contains("bloom_filter_agg"), e.getMessage)
  }

  test("a fresh session built withExtensions gets the functions") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // NOTE: if an earlier session exists, getOrCreate reuses it and the
    // extension may be a no-op there — register() covers that path.
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT size(tokenize_words('a b')) AS n")
      .collect().head.getInt(0) == 2)
  }
}
