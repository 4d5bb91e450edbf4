package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange formats beyond parquet — the loaders/sinks a pipeline
  * needs at its edges (the reference's surface is text files; a
  * training-data pipeline additionally speaks JSONL and CSV).
  *
  * Reads always pin an explicit schema: schema inference over a
  * 100 TB JSONL directory is a full extra scan of the data, and
  * inferred types drift (ints become longs become doubles) between
  * samples. Writes are plain distributed sinks — one file per
  * partition, no driver funnel.
  */
object Formats {

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** CSV with full quoting so free text (embedded newlines, commas,
    * quotes) survives the round trip; multiLine on read for the
    * embedded-newline case.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("quoteAll", "true")
      .option("escape", "\"")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)

  /** ORC — the second columnar interchange format (warehouse-side
    * tables are as often ORC as parquet). Columnar + compressed +
    * predicate-pushdown-capable, so unlike the text formats it keeps
    * the scan-side pruning contracts (`PushedFilters`/narrow
    * ReadSchema) the parquet paths rely on. Schema pinned on read for
    * the same no-inference-scan reason as JSONL/CSV.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Hive-style partitioned parquet layout — the directory design
    * every 100 TB corpus ships with (`.../source=src3/lang=en/...`):
    * a filter on a partition column prunes whole directories at
    * PLANNING time (`PartitionFilters` in the scan, zero I/O for
    * excluded partitions), where an unpartitioned layout pays a
    * footer read per file. Partition columns should be low-
    * cardinality (source, lang, date); high-cardinality keys belong
    * in `ScaleOps.writeBucketed` buckets instead — millions of tiny
    * directories are their own scale bug. `maxRecordsPerFile` guards
    * the other failure mode (one giant file per partition).
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       maxRecordsPerFile: Long = 5000000L): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Read a partitioned layout. Partition-column types are pinned
    * via `schema` like every other reader (partition-value inference
    * has the same drift problem as data inference).
    */
  def readPartitioned(spark: SparkSession, path: String,
                      schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)
}
