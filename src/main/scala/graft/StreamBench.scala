package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{ContentDedup, NearDedup, StreamingIngest}

/** Streaming throughput measurement: drives each streaming dedup
  * operator with generated micro-batches through a MemoryStream and
  * reports docs/second of end-to-end micro-batch processing
  * (signature computation + state store + emission), one JSON line
  * like [[Bench]]. Event time advances 1 s per 100 docs against a
  * 10 s watermark, so state holds a steady ~1,000-doc horizon —
  * the operators run in their intended bounded-state regime, not an
  * ever-growing one.
  *
  * Docs are deterministic ~25-token texts from a fixed vocabulary;
  * every 10th doc repeats an earlier text (exact-dup pressure on the
  * dedup state and pair emission).
  *
  * Each query's line also reports its final state size (rows +
  * RocksDB memory) so throughput can be read AGAINST state growth —
  * the scale question for a long-running stream is whether docs/s
  * holds as the horizon grows, and `[horizonSec]` (default 10)
  * scales the watermark to put 10× / 100× more documents in state.
  *
  * Usage: runMain graft.StreamBench [nDocs] [batchSize] [horizonSec]
  */
object StreamBench {

  private val vocab = Array(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
    "stream", "shard", "bucket", "signature", "window", "state",
    "corpus", "token", "parquet", "shuffle", "watermark", "batch")

  private def docText(i: Long): String = {
    val base = if (i % 10 == 9) i - 5 else i // every 10th repeats
    var v = base * 6364136223846793005L + 1442695040888963407L
    val sb = new StringBuilder
    var k = 0
    while (k < 25) {
      v = v * 6364136223846793005L + 1442695040888963407L
      sb.append(vocab(((v >>> 33) % vocab.length).toInt)).append(' ')
      k += 1
    }
    sb.append("doc ").append(base) // keep non-repeated docs distinct
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val batch = if (args.length > 1) args(1).toInt else 2000
    val horizonSec = if (args.length > 2) args(2).toInt else 10
    val wm = s"$horizonSec seconds"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(8)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def run(name: String, pipe: DataFrame => DataFrame)
        : (String, Double, Long, Long) = {
      val in = MemoryStream[(Long, String, Timestamp)]
      val q = pipe(in.toDF().toDF("doc_id", "text", "ts"))
        .writeStream.format("noop").outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        var i = 0L
        while (i < nDocs) {
          val rows = (i until math.min(i + batch, nDocs)).map { j =>
            (j, docText(j), new Timestamp(j * 10L)) // 1 s per 100 docs
          }
          in.addData(rows)
          i += batch
        }
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
        (name, nDocs / dt,
         ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum)
      } finally q.stop()
    }

    // stream-stream attribution join: views on one stream, clicks
    // (every 3rd event, +5 s, same user) on the other; same event-time
    // cadence, 1-minute horizon. Times sit a day past the epoch (the
    // state-watermark zero-clamp evicts an event AT exactly epoch 0).
    def runJoin(name: String): (String, Double, Long, Long) = {
      val dayMs = 86400000L
      val vIn = MemoryStream[(Timestamp, Long)]
      val cIn = MemoryStream[(Timestamp, Long)]
      val q = graft.streaming.EventAnalytics.attributedPairs(
          vIn.toDF().toDF("ts", "user_id"),
          cIn.toDF().toDF("ts", "user_id"),
          horizonMinutes = 1, lateness = wm)
        .writeStream.format("noop").outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        var i = 0L
        while (i < nDocs) {
          val hi = math.min(i + batch, nDocs)
          vIn.addData((i until hi).map(j =>
            (new Timestamp(dayMs + j * 10L), j % 500)))
          cIn.addData((i until hi by 3).map(j =>
            (new Timestamp(dayMs + j * 10L + 5000L), j % 500)))
          i += batch
        }
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
        (name, nDocs / dt,
         ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum)
      } finally q.stop()
    }

    // per-user funnel state machine: 500 users, each user's event
    // sequence ascends in event time and cycles view → click →
    // purchase → error, so every user works through the whole funnel
    // (plus a non-step event) and state settles at one row per user
    def runFunnel(name: String): (String, Double, Long, Long) = {
      val dayMs = 86400000L
      val types = Array("view", "click", "purchase", "error")
      val in = MemoryStream[graft.streaming.StreamingFunnel.FunnelEvent]
      val q = graft.streaming.StreamingFunnel.steps(in.toDS())
        .writeStream.format("noop").outputMode("append").start()
      try {
        val t0 = System.nanoTime()
        var i = 0L
        while (i < nDocs) {
          val hi = math.min(i + batch, nDocs)
          in.addData((i until hi).map(j =>
            graft.streaming.StreamingFunnel.FunnelEvent(
              j % 500, types(((j / 500) % 4).toInt),
              new Timestamp(dayMs + j * 10L))))
          i += batch
        }
        q.processAllAvailable()
        val dt = (System.nanoTime() - t0) / 1e9
        val ops = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
        (name, nDocs / dt,
         ops.map(_.numRowsTotal).sum, ops.map(_.memoryUsedBytes).sum)
      } finally q.stop()
    }

    // static eval set for the decontamination gate: every 20th doc's
    // text, so the gate does real dropping work (~5% + repeats)
    val evalDf = {
      import spark.implicits._
      (0L until nDocs.toLong by 20L).map(i => (i, docText(i)))
        .toDF("doc_id", "text")
    }

    val results = Seq(
      run("content_dedup", df => ContentDedup.firstSeen(df, wm)),
      run("near_dedup", df => NearDedup.candidatePairs(df, wm)),
      run("ingest_composed", df => StreamingIngest.ingest(df, watermark = wm)),
      run("ingest_decontam", df =>
        StreamingIngest.ingestDecontaminated(df, evalDf, watermark = wm)),
      runJoin("attribution_join"),
      runFunnel("funnel"))
    val qs = results.map { case (n, v, rows, mem) =>
      "\"" + n + f"""\":{"docs_per_sec":$v%.1f,"state_rows":$rows,"state_bytes":$mem}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"stream_docs_per_sec","n_docs":$nDocs,"batch":$batch,"horizon_sec":$horizonSec,"queries":$qs}""")
    spark.stop()
  }
}
