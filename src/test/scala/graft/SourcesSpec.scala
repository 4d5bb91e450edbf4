package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Source-format breadth: CSV and JSON-lines round-trips preserve the
  * relational data exactly, and partition-layout writes prune at the
  * scan (the 100 TB table-layout contract).
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("CSV round-trip preserves lineitem exactly (schema-ful read)") {
    val li = Tables.lineitem(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    li.write.mode("overwrite").option("header", "true")
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .csv(s"$dir/li")
    val back = spark.read.option("header", "true")
      .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
      .schema(li.schema).csv(s"$dir/li")
    assert(back.count() == li.count())
    assert(li.except(back).isEmpty && back.except(li).isEmpty)
  }

  test("JSON-lines round-trip preserves orders exactly") {
    val o = Tables.orders(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("json").toString
    o.write.mode("overwrite").json(s"$dir/o")
    val back = spark.read.schema(o.schema).json(s"$dir/o")
    assert(o.except(back).isEmpty && back.except(o).isEmpty)
  }

  test("parquet round-trips under zstd and snappy compression") {
    val li = Tables.lineitem(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("codec").toString
    for (codec <- Seq("zstd", "snappy")) {
      li.write.mode("overwrite").option("compression", codec)
        .parquet(s"$dir/$codec")
      val back = spark.read.parquet(s"$dir/$codec")
      assert(li.except(back).isEmpty && back.except(li).isEmpty, codec)
    }
  }

  test("partitioned layout prunes partitions at the scan") {
    val o = Tables.orders(spark, sf)
      .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    o.write.mode("overwrite").partitionBy("order_month").parquet(s"$dir/o")
    val pruned = spark.read.parquet(s"$dir/o")
      .filter(col("order_month") === "1995-03")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_month"), plan)
    // pruned scan reads only the one partition's rows
    val expected = o.filter(col("order_month") === "1995-03").count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("documents/embeddings readers normalize narrow ids (regen insurance)") {
    // the events.ts lesson: the generator may regenerate a table with
    // a different-but-equivalent physical type; id consumers assume
    // 64-bit. Rewrite the tables with int32 ids and read them back
    // through Tables — downstream typed access must still see longs.
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val dir = java.nio.file.Files.createTempDirectory("narrow_ids").toString
    Tables.documents(spark, sf)
      .withColumn("doc_id", col("doc_id").cast(IntegerType))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.embeddings(spark, sf)
      .withColumn("vec_id", col("vec_id").cast(IntegerType))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val docs = Tables.documents(spark, dir)
    val embs = Tables.embeddings(spark, dir)
    assert(docs.schema("doc_id").dataType === LongType)
    assert(embs.schema("vec_id").dataType === LongType)
    // a real query runs end to end on the narrow-id files
    assert(graft.operators.Dedup.exact(spark, dir).count() > 0)
    assert(graft.operators.Similarity.annBrute(spark, dir).count() > 0)
  }
}
