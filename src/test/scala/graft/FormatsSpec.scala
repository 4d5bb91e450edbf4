package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Formats, Tables}

/** Interchange round trips: the documents table (free text with
  * arbitrary punctuation) must survive parquet → JSONL/CSV → read
  * with a pinned schema, row-for-row.
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)

  test("documents survive a JSONL round trip") {
    val path = "target/fmt_test/docs_jsonl"
    Formats.writeJsonl(docs, path)
    val back = Formats.readJsonl(spark, path, docs.schema)
    assert(back.count() == docs.count())
    assert(docs.except(back).isEmpty && back.except(docs).isEmpty)
  }

  test("documents survive a CSV round trip (quoted free text)") {
    val path = "target/fmt_test/docs_csv"
    Formats.writeCsv(docs, path)
    val back = Formats.readCsv(spark, path, docs.schema)
    assert(back.count() == docs.count())
    assert(docs.except(back).isEmpty && back.except(docs).isEmpty)
  }

  test("lineitem numerics survive a CSV round trip") {
    val li = Tables.lineitem(spark, sf)
    val path = "target/fmt_test/lineitem_csv"
    Formats.writeCsv(li, path)
    val back = Formats.readCsv(spark, path, li.schema)
    assert(li.except(back).isEmpty && back.except(li).isEmpty)
  }

  test("documents and lineitem survive an ORC round trip") {
    for ((df, name) <- Seq((docs, "docs"), (Tables.lineitem(spark, sf), "lineitem"))) {
      val path = s"target/fmt_test/${name}_orc"
      Formats.writeOrc(df, path)
      val back = Formats.readOrc(spark, path, df.schema)
      assert(df.except(back).isEmpty && back.except(df).isEmpty, name)
    }
  }

  test("partitioned layout round-trips and prunes partitions at planning time") {
    import org.apache.spark.sql.functions.col
    val path = "target/fmt_test/docs_part"
    Formats.writePartitioned(docs, path, Seq("lang"))
    val back = Formats.readPartitioned(spark, path, docs.schema)
    // partitionBy moves the partition column last in the physical
    // layout; compare column-order-insensitively
    val cols = docs.columns.sorted.map(col).toSeq
    assert(docs.select(cols: _*).except(back.select(cols: _*)).isEmpty &&
           back.select(cols: _*).except(docs.select(cols: _*)).isEmpty)
    // a lang filter must become a PartitionFilter (planning-time
    // directory pruning), NOT a PushedFilter (per-file evaluation)
    val filtered = back.filter(col("lang") === "en")
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters:") &&
           scan.replaceAll("(?s).*PartitionFilters:", "").contains("lang"),
      s"lang filter did not become a partition filter:\n$scan")
    // pruning effectiveness: the pruned scan's numFiles metric must
    // be strictly below the full scan's (only the lang=en directory).
    // collect() executes the DataFrame's OWN queryExecution — count()
    // would build a separate one and leave these metrics untouched
    assert(filtered.collect().length ===
      docs.filter(col("lang") === "en").count())
    val fullScan = back.select(col("doc_id"), col("lang"))
    fullScan.collect()
    val filesF = filtered.queryExecution.executedPlan
      .collectLeaves().head.metrics("numFiles").value
    val filesAll = fullScan.queryExecution.executedPlan
      .collectLeaves().head.metrics("numFiles").value
    assert(filesF > 0 && filesF < filesAll,
      s"partition pruning ineffective: $filesF of $filesAll files scanned")
  }

  test("ORC scans keep predicate pushdown and column pruning") {
    val path = "target/fmt_test/lineitem_orc_push"
    Formats.writeOrc(Tables.lineitem(spark, sf), path)
    val back = Formats.readOrc(spark, path, Tables.lineitem(spark, sf).schema)
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val scan = back.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"),
      s"no pushed filter in ORC scan:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:"),
      s"ORC scan reads more than the projected columns:\n$scan")
  }
}
