package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextPipeline

/** Pins for the cleanse drop-reason attribution (`pipe_drop_reasons`):
  * the `kept` rows must be EXACTLY pipe_modern's output (the report
  * attributes the real pipeline, not a parallel one), every document
  * appears exactly once with a closed reason vocabulary, and planted
  * corpora pin the quality/duplicate attributions including the
  * zero-word ANSI-division guard. (Cross-engine exactness is the
  * oracle gate's job.)
  */
class DropReasonsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("kept rows are exactly pipe_modern's output; taxonomy closed; total is the corpus") {
    val reasons = SparkEntry.queries("pipe_drop_reasons")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(reasons.length.toLong === nDocs)
    val vocab = reasons.map(_._2).toSet
    assert(vocab.subsetOf(Set("quality", "duplicate", "dsir", "kept")), vocab)
    // pipe_modern OUTPUTS every gate+dedup survivor with the DSIR
    // verdict as its `selected` column: kept == its selected rows,
    // dsir == its unselected rows, and together they are its output
    val kept = reasons.collect { case (id, "kept") => id }.toSet
    val dsir = reasons.collect { case (id, "dsir") => id }.toSet
    val modern = SparkEntry.queries("pipe_modern")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(kept === modern.collect { case (id, true) => id }.toSet)
    assert(dsir === modern.collect { case (id, false) => id }.toSet)
    assert(kept ++ dsir === modern.keySet)
    // and the report is the exact rollup of the reasons
    val report = SparkEntry.queries("pipe_drop_report")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val full = SparkEntry.queries("pipe_drop_reasons")(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2)))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(report === full)
  }

  test("planted corpus: quality gate, zero-word guard and duplicate keep rule attribute correctly") {
    val s = spark
    import s.implicits._
    val good = ("the quick brown fox jumps over the lazy dog again " * 6).trim
    val docs = Seq(
      (1L, "srcA", "en", good),            // gate-passing keeper (min id of its group)
      (2L, "srcA", "en", "too few words"), // quality: < 50 words
      (3L, "srcB", "en", good),            // duplicate of 1 (same normalized text)
      (4L, "srcB", "en", ""),              // quality via the zero-word guard
      (5L, "srcB", "en", "#### " * 60)     // quality: symbol ratio / alpha frac
    ).toDF("doc_id", "source", "lang", "text")
    val out = TextPipeline.dropReasonsOf(docs).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(2L) === "quality")
    assert(out(4L) === "quality")
    assert(out(5L) === "quality")
    assert(out(3L) === "duplicate")
    assert(Set("dsir", "kept")(out(1L))) // DSIR verdict is corpus-dependent
  }
}
