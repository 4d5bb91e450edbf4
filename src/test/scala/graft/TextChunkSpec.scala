package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextPipeline

/** Chunking invariants beyond the DuckDB oracle: full coverage with
  * exact overlap, contiguous indices, bounded sizes.
  */
class TextChunkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("every token is covered exactly once outside the shared overlaps") {
    val chunks = TextPipeline.chunkDocs(spark, sf)
      .groupBy("doc_id")
      .agg(sum(col("n_chunk_tokens")).as("tok_sum"),
           count(lit(1)).as("nchunks"),
           max(col("chunk_idx")).as("max_idx"))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(graft.functions.CrossEngine.tokens(col("text"))).as("n"))
      .filter(col("n") > 0)
    val joined = chunks.join(docs, "doc_id")
    // Σ chunk sizes = n + overlap·(chunks−1): full coverage, exact overlap
    assert(joined.filter(col("tok_sum") =!= col("n") + lit(8) * (col("nchunks") - 1))
      .isEmpty)
    // indices are 0..nchunks-1 (explode preserved density)
    assert(joined.filter(col("max_idx") =!= col("nchunks") - 1).isEmpty)
    // every tokenized doc chunks
    assert(joined.count() == docs.count())
  }

  test("piece-budgeted chunks cover every subword piece exactly once " +
       "outside the shared overlaps") {
    val chunks = TextPipeline.chunkDocsBpe(spark, sf)
      .groupBy("doc_id")
      .agg(sum(col("n_chunk_pieces")).as("pc_sum"),
           count(lit(1)).as("nchunks"),
           max(col("chunk_idx")).as("max_idx"))
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.BpeTokenizer.subwordCount(col("text")).as("n"))
      .filter(col("n") > 0)
    val joined = chunks.join(docs, "doc_id")
    // Σ chunk sizes = n + overlap·(chunks−1), restated in PIECES —
    // and the doc piece count comes from subwordCount, so chunking
    // and budgeting provably speak the same unit
    assert(joined.filter(col("pc_sum") =!= col("n") + lit(16) * (col("nchunks") - 1))
      .isEmpty)
    assert(joined.filter(col("max_idx") =!= col("nchunks") - 1).isEmpty)
    assert(joined.count() == docs.count())
  }

  test("chunk sizes are bounded and the last chunk exceeds the overlap") {
    val c = TextPipeline.chunkDocs(spark, sf)
    assert(c.filter(col("n_chunk_tokens") > 40).isEmpty)
    assert(c.filter(col("n_chunk_tokens") < 1).isEmpty)
    // any chunk shorter than a full window is the doc's last, and
    // still longer than the overlap (no chunk is pure repetition)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
    val flagged = c.withColumn("max_idx", max(col("chunk_idx")).over(w))
      .filter(col("n_chunk_tokens") < 40 &&
              (col("chunk_idx") =!= col("max_idx") ||
               (col("max_idx") > 0 && col("n_chunk_tokens") <= 8)))
    assert(flagged.isEmpty)
  }
}
