package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.EntropyOf.{array_entropy, codepoint_entropy}
import graft.operators.TextPipeline

/** Pins for the map-side entropy expressions and the `txt_entropy`
  * query. Hand cases fix the log2 formula at exactly-representable
  * points (0, 1, 2 bits) including non-BMP surrogate pairs the
  * synthetic corpus never exercises; the corpus differential
  * recomputes both entropies per doc in plain Scala
  * (`codePoints()` + HashMap — not the expression under test) and the
  * plan tests pin the no-shuffle shape the scaladoc claims.
  */
class EntropySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def cpOf(s: String): Double = {
    val got = spark.range(1)
      .select(codepoint_entropy(lit(s)).as("h")).head.getDouble(0)
    got
  }

  test("codepoint entropy hand cases") {
    assert(cpOf("") == 0.0)
    assert(cpOf("aaaa") == 0.0)
    assert(cpOf("abab") == 1.0)
    assert(cpOf("abcd") == 2.0)
    assert(cpOf("漢字漢字") == 1.0)
    // U+1D11E is a surrogate pair in UTF-16: each 𝄞 must count as ONE
    // codepoint (DuckDB's string_split splits this way too)
    assert(cpOf("a𝄞a𝄞") == 1.0)
  }

  test("array entropy hand cases: counts elements, skips nulls") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1, Seq("x", "x", "y", "y")),
      (2, Seq("x")),
      (3, Seq[String]()),
    ).toDF("id", "a")
      .select(col("id"), array_entropy(col("a")).as("h"))
    val got = df.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got == Map(1 -> 1.0, 2 -> 0.0, 3 -> 0.0))
    // null element skipped: x,null,y,y -> counts {x:1, y:2}
    val withNull = spark.sql(
      "SELECT array('x', CAST(NULL AS STRING), 'y', 'y') AS a")
      .select(array_entropy(col("a")).as("h")).head.getDouble(0)
    val expected = (math.log(3.0) - (1 * math.log(1.0) + 2 * math.log(2.0)) / 3.0) / math.log(2.0)
    assert(math.abs(withNull - expected) < 1e-12)
  }

  test("txt_entropy matches an independent Scala recompute on the corpus") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val got = TextPipeline.entropyOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap

    def entropy[T](xs: Seq[T]): Double = {
      val counts = xs.groupBy(identity).map(_._2.size.toLong)
      val n = xs.size.toDouble
      if (n == 0) 0.0
      else (math.log(n) - counts.map(c => c * math.log(c.toDouble)).sum / n) / math.log(2.0)
    }
    def pround4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4

    val expected = docs.select("doc_id", "text").collect().flatMap { r =>
      val text = r.getString(1)
      val toks = text.split("[^\\p{L}]+").filter(_.nonEmpty).toSeq
      if (toks.isEmpty) None
      else {
        val cps = text.codePoints().toArray.toSeq
        Some(r.getLong(0) -> ((pround4(entropy(cps)), pround4(entropy(toks)),
          toks.size.toLong)))
      }
    }.toMap
    assert(got.size == expected.size)
    assert(got == expected)
  }

  test("the only exchange in txt_entropy is the final orderBy") {
    val df = TextPipeline.entropyOf(graft.sources.Tables.documents(spark, sf))
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }

  test("the entropy projection stays inside whole-stage codegen") {
    val df = spark.range(3).select(
      codepoint_entropy(concat(lit("ab"), col("id"))).as("h1"),
      array_entropy(array(lit("x"), lit("y"))).as("h2"))
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }
}
