package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** The reference engine's user-extension surface, Spark-typed.
  *
  * The reference's entire pluggable API is the pair
  *   `Map(filename, contents) []KeyValue`  (wc/wc.go:26-39; a UDTF)
  *   `Reduce(key, values) string`          (wc/wc.go:44-47; a UDAF)
  * loaded as Go plugins (mrsequential.go:146-163) — "swap the .so,
  * get a new query". Here the same contract is a trait: users supply
  * a typed flatMap and an incremental [[Aggregator]], and the engine
  * runs them as `flatMap → groupByKey → agg`.
  *
  * The deliberate scale upgrade over the reference: `Reduce` there
  * receives the fully materialized value list per key
  * (mapreduce/worker.go:152,183 builds `map[string][]string`), which
  * cannot work at 100 TB. An [[Aggregator]] is incremental and
  * merge-able, so Spark runs it as partial aggregation before the
  * shuffle (map-side combine) and never materializes a value list.
  */
abstract class MapReduceJob[K, V, OUT] extends Serializable {

  /** One input record (id, content) → any number of (key, value). */
  def map(recordId: String, contents: String): IterableOnce[(K, V)]

  /** Incremental reducer over the values of one key. */
  def reduce: Aggregator[V, _, OUT]

  def run(docs: Dataset[(String, String)])(implicit
      kEnc: Encoder[K], kvEnc: Encoder[(K, V)],
      outEnc: Encoder[(K, OUT)], vEnc: Encoder[V]): Dataset[(K, OUT)] =
    docs
      .flatMap { case (id, contents) => map(id, contents) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(reduce.toColumn)
}

/** Word count expressed through the plugin surface — semantically the
  * reference's wc.so plugin. `map` mirrors wc.go:26-39; the reducer is
  * a pure running count (wc.go:44-47 via `len(values)`, made
  * incremental).
  */
object WordCountJob extends MapReduceJob[String, Long, Long] {

  override def map(recordId: String, contents: String): IterableOnce[(String, Long)] =
    contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty).map(w => (w, 1L))

  override val reduce: Aggregator[Long, Long, Long] =
    new Aggregator[Long, Long, Long] {
      def zero: Long = 0L
      def reduce(b: Long, a: Long): Long = b + a
      def merge(b1: Long, b2: Long): Long = b1 + b2
      def finish(b: Long): Long = b
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Convenience: run over text files, matching TextAnalytics output. */
  def overFiles(spark: SparkSession, paths: String*): Dataset[(String, Long)] = {
    import spark.implicits._
    val docs = spark.read.textFile(paths: _*).map(line => ("", line))
    run(docs)
  }
}

/** A second plugin — "swap the .so, get a new query"
  * (mrsequential.go:146-163): longest word per initial letter. Same
  * tokenization as [[WordCountJob]]; key is the word's first code
  * point, value its code-point length (UTF-16 `length` would drift
  * from the SQL oracle's character counting on astral-plane text),
  * reducer an incremental MAX. Exists to prove the generic
  * [[MapReduceSql.registerJob]] front door is job-agnostic, not
  * word-count-shaped.
  */
object MaxLenJob extends MapReduceJob[String, Long, Long] {

  override def map(recordId: String, contents: String): IterableOnce[(String, Long)] =
    contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty).map { w =>
      (w.substring(0, w.offsetByCodePoints(0, 1)),
        w.codePointCount(0, w.length).toLong)
    }

  override val reduce: Aggregator[Long, Long, Long] =
    new Aggregator[Long, Long, Long] {
      def zero: Long = Long.MinValue
      def reduce(b: Long, a: Long): Long = math.max(b, a)
      def merge(b1: Long, b2: Long): Long = math.max(b1, b2)
      def finish(b: Long): Long = b
      def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
}
