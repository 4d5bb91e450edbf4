package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference's replication subsystem (replication/replication.go)
  * as Structured Streaming — SURVEY.md §2.7, operators W1-W7.
  *
  * Reference semantics re-expressed, mechanism replaced:
  *  - W1 rate-limited replay: leader emits one ID'd line per 2 s tick
  *    (replication.go:156-213) → a streaming read with a processing-
  *    time trigger; the ID is carried in the data.
  *  - W2 stale-drop: messages older than 2 s discarded
  *    (replication.go:56-58 et al.) → `withWatermark("ts", "2 seconds")`.
  *  - W6 upsert-by-id: duplicate IDs replace (insertDataItemSorted,
  *    replication.go:553-575) → `dropDuplicates("id")` under the
  *    watermark.
  *  - W5/W7 buffered checkpoint + resume-from-offset → the streaming
  *    checkpoint; exactly-once replaces the hand-rolled JSON dump.
  *  - W3/W4 gap detection + repair: the 10 s CheckAndDump scan
  *    (replication.go:339-460) building [start,end] missing ranges →
  *    checkpoint replay makes repair unnecessary; the detection
  *    semantics are kept as [[gapRanges]], the reconciliation query
  *    you run to PROVE the guarantee holds.
  */
object ReplicatedLog {

  /** One replicated record: dense id, payload line, arrival time. */
  case class LogRecord(id: Long, value: String, ts: java.sql.Timestamp)

  /** W2+W6: drop stale rows, keep one row per id. */
  def dedupe(stream: DataFrame, watermark: String = "2 seconds"): DataFrame =
    stream.withWatermark("ts", watermark).dropDuplicates("id")

  /** Full pipeline: stream in → stale-drop → dedupe → checkpointed
    * parquet sink. Restart with the same checkpoint dir resumes from
    * the recorded offsets (W7) with no loss and no dupes.
    */
  def start(stream: DataFrame, checkpointDir: String, outDir: String,
            watermark: String = "2 seconds",
            trigger: Trigger = Trigger.ProcessingTime("2 seconds")): StreamingQuery =
    dedupe(stream, watermark).writeStream
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .option("path", outDir)
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** W3: missing-range scan. Returns [gap_start, gap_end] for every
    * hole in the observed id sequence, starting from `startId`
    * (replication.go:345-406 scans memory + file for exactly these
    * ranges). Runs as the distributed gaps-and-islands operator:
    * range-bucketed per-bucket lag with a broadcast boundary carry —
    * no single-partition window at any size (ScaleOps.gapRanges).
    */
  def gapRanges(observed: DataFrame, idCol: String = "id",
                startId: Long = 1L): DataFrame =
    graft.operators.ScaleOps.gapRanges(observed, idCol, Some(startId))

  /** W3 as an anti-join (the form SURVEY §2.7 documents): expected ids
    * `startId..maxId` minus observed. Equivalent to [[gapRanges]]
    * exploded; useful when the expected set is small or already a
    * table. Returns individual missing ids.
    */
  def missingIds(spark: SparkSession, observed: DataFrame, maxId: Long,
                 idCol: String = "id", startId: Long = 1L): DataFrame = {
    val expected = spark.range(startId, maxId + 1).toDF("id")
    expected.join(observed.select(col(idCol).cast("long").as("id")).distinct(),
                  Seq("id"), "left_anti")
      .orderBy(col("id"))
  }

  /** Render the sink table in the reference's checkpoint format —
    * one JSON object mapping id -> line (`<nodeid>-replication.json`,
    * replication.go:463-494) — for interop with reference tooling.
    *
    * This is a DELIBERATE driver-side materialization (the reference
    * format is one JSON document), so it carries an explicit size
    * guard: beyond `maxRows` the call fails loudly instead of
    * OOM-ing the driver on a sink that outgrew the interop format.
    * Large sinks should ship as parquet/JSONL (`Formats`), not as
    * one JSON object.
    */
  def checkpointJson(sink: DataFrame, maxRows: Long = 1000000L): String = {
    import org.apache.spark.sql.functions.{col, collect_list, map_from_arrays, to_json}
    val n = sink.count()
    require(n <= maxRows,
      s"checkpointJson renders the whole sink as ONE driver-side JSON " +
        s"document; sink has $n rows > maxRows=$maxRows. Use " +
        s"Formats.writeJsonl for sinks beyond the interop format's size.")
    sink.select(col("id").cast("string").as("k"), col("value").as("v"))
      .orderBy(col("id").cast("long"))
      .agg(to_json(map_from_arrays(collect_list(col("k")), collect_list(col("v")))))
      .head().getString(0)
  }

  /** Replay a completed result table as a rate-limited stream (W1):
    * the leader's 2 s broadcast of `mr-out-final` lines, one file per
    * trigger. `linesDir` must contain the text lines; ids are assigned
    * by line order within the single sorted input.
    */
  def replaySource(spark: SparkSession, linesDir: String,
                   maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(linesDir)
      .withColumn("ts", current_timestamp())
}
