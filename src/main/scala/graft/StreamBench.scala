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
  * Usage: runMain graft.StreamBench [nDocs] [batchSize]
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
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(8)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def run(name: String, pipe: DataFrame => DataFrame): (String, Double) = {
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
        name -> nDocs / dt
      } finally q.stop()
    }

    val results = Seq(
      run("content_dedup", df => ContentDedup.firstSeen(df)),
      run("near_dedup", df => NearDedup.candidatePairs(df)),
      run("ingest_composed", df => StreamingIngest.ingest(df)))
    val qs = results.map { case (n, v) => "\"" + n + f"\":$v%.1f" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"stream_docs_per_sec","n_docs":$nDocs,"batch":$batch,"queries":$qs}""")
    spark.stop()
  }
}
