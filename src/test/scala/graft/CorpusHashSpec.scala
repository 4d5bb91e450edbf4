package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the corpus content fingerprint (`ops_corpus_hash`): the
  * reproducibility claim itself — identical under ANY physical
  * layout, task ordering or partition count — and content
  * sensitivity (a one-character change flips the hash). Cross-engine
  * exactness is the oracle gate's job.
  */
class CorpusHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def rows() =
    SparkEntry.queries("ops_corpus_hash")(spark, sf).collect().map(_.toSeq).toSeq

  test("fingerprint is invariant to partitioning and row order") {
    val base = rows()
    val docs = graft.sources.Tables.documents(spark, sf)
      .repartition(13, col("n_chars")).sortWithinPartitions(col("text"))
    val p = concat_ws("", col("doc_id").cast("string"), col("text"),
      col("lang"), col("source"), col("n_chars").cast("string"))
    val re = docs.select(col("source"),
        graft.functions.CrossEngine.portableHash(p).as("hi"),
        graft.functions.CrossEngine.portableHashLo(p).as("lo"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(hi)").as("content_hash_hi"),
        expr("bit_xor(lo)").as("content_hash_lo"),
        expr("sum(hi % 1048576)").as("content_sum_hi"),
        expr("sum(lo % 1048576)").as("content_sum_lo"))
      .orderBy(col("source")).collect().map(_.toSeq).toSeq
    assert(re === base)
  }

  test("a single-character content change flips the source's hash") {
    val s = spark
    import s.implicits._
    def hashOf(text: String) = {
      val p = concat_ws("", col("doc_id").cast("string"), col("text"),
        col("lang"), col("source"), col("n_chars").cast("string"))
      Seq((1L, text, "en", "src0", text.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .select(graft.functions.CrossEngine.portableHash(p).as("hi"),
          graft.functions.CrossEngine.portableHashLo(p).as("lo"))
        .collect().head.toSeq
    }
    assert(hashOf("the quick brown fox") !== hashOf("the quick brown fax"))
  }
}
