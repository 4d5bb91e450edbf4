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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. The GraftSession builder sets
    * `spark.sql.legacy.parquet.nanosAsLong` so the column arrives as
    * a raw nanosecond long; here it is truncated to microseconds —
    * the same floor conversion DuckDB applies when it loads ns into
    * its µs timestamp, so both engines see identical instants. (No
    * session-conf mutation here: a loader silently flipping a session
    * flag would change behavior for every other reader. A session
    * built without the flag fails this read loudly instead.)
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet needs spark.sql.legacy.parquet.nanosAsLong=true " +
        "(set by GraftSession.builder)")
    load(s, d, "events")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
