package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * One parquet file per table under `/root/testdata/sf*`/. Columnar
  * scans get predicate pushdown + column pruning from Catalyst for
  * free; at cluster scale these would be partitioned/bucketed
  * directories and nothing here would change — `spark.read.parquet`
  * plans `FilePartition`s from whatever file layout it finds.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Inferred schemas, cached per (dir, table). Schema inference runs
    * a footer-reading Spark job on every fresh `spark.read.parquet`;
    * pinning the schema after the first read makes every later plan
    * build job-free (and at cluster scale skips re-listing thousands
    * of footers per query). The nanosAsLong flag participates in the
    * key because it changes the inferred type of events.ts.
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = s"${spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")}:$path"
    val schema = schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Register every test table as a temp view so the engine's SQL
    * surface (`spark.sql`) works against them by name.
    */
  def registerViews(s: SparkSession, d: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(s, d) else load(s, d, n)
      df.createOrReplaceTempView(n)
    }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped in two parquet encodings and a
    * production reader must accept both, so this adapts to whatever
    * the file declares instead of legislating one protocol:
    *
    *  - TIMESTAMP(MICROS): arrives as TimestampType/TimestampNTZType.
    *    NTZ is cast to TimestampType (session TZ is UTC, so the cast
    *    is value-preserving) to keep one downstream type for every
    *    consumer — windows, as-of joins, resample all see
    *    TimestampType regardless of the file's isAdjustedToUTC bit.
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; the
    *    GraftSession builder sets
    *    `spark.sql.legacy.parquet.nanosAsLong` so the column arrives
    *    as a raw nanosecond long, truncated here to microseconds —
    *    the same floor conversion DuckDB applies when it loads ns
    *    into its µs timestamp, so both engines see identical
    *    instants.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case TimestampType    => df
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case LongType         =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported parquet encoding $other " +
          "(expected TIMESTAMP(MICROS), TIMESTAMP(NANOS) via nanosAsLong, or raw ns long)")
    }
  }
  /** The events lesson, applied before it recurs: ids arrive as
    * whatever integer width the generator last chose. Downstream code
    * (typed collects, % arithmetic against long literals, join keys)
    * assumes 64-bit, so normalize here — Catalyst's SimplifyCasts
    * removes the cast when the file already says int64, leaving
    * today's plans byte-identical.
    */
  def documents(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    load(s, d, "documents").withColumn("doc_id", col("doc_id").cast("long"))
  }
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    load(s, d, "embeddings").withColumn("vec_id", col("vec_id").cast("long"))
  }
}
