package graft

import org.apache.spark.sql.functions._

/** Ladder measurement for the streaming IVF-PQ index maintainer
  * ([[graft.streaming.StreamingAnnIndex]]): one-time init (train +
  * full encode) over the given corpus' embeddings, then per-batch
  * maintenance cost for a fixed-size synthetic batch (the corpus'
  * own vectors re-keyed — same dimensionality and distribution), then
  * serving cost against the maintained chain. Prints one JSON line.
  *
  * Usage: runMain graft.AnnStreamScale [srcDir] [batchSize]
  */
object AnnStreamScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchSize = if (args.length > 1) args(1).toInt else 10000
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus, 4]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.streaming.StreamingAnnIndex

    val root = java.nio.file.Files
      .createTempDirectory("graft_annscale").toString
    val raw = graft.sources.Tables.embeddings(spark, src)
      .select(col("vec_id"), col("embedding"))
    def timed(run: => Unit): Double = {
      val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e9
    }
    val nCorpus = raw.count()
    val tInit = timed { StreamingAnnIndex.init(spark, raw, root) }
    // two maintenance batches: corpus vectors re-keyed past the id range
    val batch1 = raw.orderBy(col("vec_id")).limit(batchSize)
      .select((col("vec_id") + lit(1000000000L)).as("vec_id"), col("embedding"))
    val batch2 = raw.orderBy(col("vec_id")).limit(batchSize)
      .select((col("vec_id") + lit(2000000000L)).as("vec_id"), col("embedding"))
    val tBatch1 = timed { StreamingAnnIndex.applyBatch(batch1, root, 0L) }
    val tBatch2 = timed { StreamingAnnIndex.applyBatch(batch2, root, 1L) }
    val tSearch = timed {
      StreamingAnnIndex.search(spark, raw, root)
        .write.format("noop").mode("overwrite").save()
    }
    val tDrift = timed {
      StreamingAnnIndex.drift(spark, root).collect()
    }
    println(s"""{"metric":"ann_stream_scale","n_corpus":$nCorpus,""" +
      s""""batch_size":$batchSize,"init_sec":$tInit,""" +
      s""""batch1_sec":$tBatch1,"batch2_sec":$tBatch2,""" +
      s""""search_sec":$tSearch,"drift_sec":$tDrift,"src":"$src"}""")
    spark.stop()
  }
}
