package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming content dedup — the incremental form of the batch
  * `Dedup.exact` operator: a live ingestion pipeline drops duplicate
  * documents as they arrive instead of re-scanning the corpus.
  *
  * Scale shape mirrors the batch twin: only the 16-byte md5 of the
  * text is keyed into state (RocksDB, watermark-bounded), documents
  * themselves never enter the state store. With a lateness horizon
  * of `watermark`, state is O(docs within the horizon), not O(corpus)
  * — the standard trade: duplicates farther apart than the horizon
  * fall back to the batch dedup sweep.
  */
object ContentDedup {

  /** stream: (doc_id, text, ts). Emits first-seen documents only.
    *
    * Uses `dropDuplicatesWithinWatermark`: plain `dropDuplicates` on a
    * non-event-time subset never evicts its state (Spark only purges
    * dedup state when the event-time column is part of the key), so
    * the md5 set would grow with every distinct document forever.
    * The withinWatermark variant expires each key once the watermark
    * passes it — exactly the documented O(docs within the horizon)
    * contract.
    */
  def firstSeen(stream: DataFrame, watermark: String = "10 seconds"): DataFrame =
    stream
      .withColumn("text_md5", md5(col("text").cast("binary")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_md5")
}
