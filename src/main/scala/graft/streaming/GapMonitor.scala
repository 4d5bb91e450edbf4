package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Live gap detection as arbitrary stateful streaming — the
  * reference's CheckAndDump scan (replication/replication.go:339-460)
  * as a Spark 4 `transformWithState` StatefulProcessor (the same API
  * level as [[BufferedFlush]]; the original flatMapGroupsWithState
  * form kept a sorted Seq blob and re-emitted every open gap on every
  * touched batch).
  *
  * Ids are grouped into fixed-width buckets (id div bucketSize):
  *  - state is ONE ValueState row per bucket holding a bucketSize-bit
  *    bitmap (bucketSize/8 bytes, exactly bounded — it cannot grow
  *    with arrival count or order);
  *  - emission is delta-only: a batch emits an event only for gaps it
  *    OPENED (`status = "open"`) or CLOSED (`status = "closed"`)
  *    relative to the bucket's previous bitmap — a bucket receiving
  *    rows that change nothing emits nothing. A gap that shrinks
  *    ([3,4] → [3,3]) closes its old interval and opens the new one;
  *    downstream applies events as keyed upserts.
  */
object GapMonitor {

  case class GapEvent(bucket: Long, gapStart: Long, gapEnd: Long, status: String)

  class Processor(bucketSize: Long, startId: Long)
      extends StatefulProcessor[Long, ReplicatedLog.LogRecord, GapEvent] {

    @transient private var seen: ValueState[Array[Byte]] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Array[Byte]](
        "seen", Encoders.BINARY, TTLConfig.NONE)

    override def handleInputRows(
        bucket: Long,
        rows: Iterator[ReplicatedLog.LogRecord],
        timerValues: TimerValues): Iterator[GapEvent] = {
      val nBytes = ((bucketSize + 7) / 8).toInt
      val bits =
        if (seen.exists()) seen.get() else new Array[Byte](nBytes)
      val before = openGaps(bucket, bits, bucketSize, startId)
      val base = bucket * bucketSize
      rows.foreach { r =>
        val off = (r.id - base).toInt
        if (off >= 0 && off < bucketSize)
          bits(off >> 3) = (bits(off >> 3) | (1 << (off & 7))).toByte
      }
      seen.update(bits)
      val after = openGaps(bucket, bits, bucketSize, startId)
      val closes = before.diff(after)
        .map { case (a, b) => GapEvent(bucket, a, b, "closed") }
      val opens = after.diff(before)
        .map { case (a, b) => GapEvent(bucket, a, b, "open") }
      (closes ++ opens).iterator
    }

    override def handleExpiredTimer(
        bucket: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[GapEvent] =
      Iterator.empty
  }

  def monitor(stream: Dataset[ReplicatedLog.LogRecord],
              bucketSize: Long = 1000L,
              startId: Long = 1L): Dataset[GapEvent] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .groupByKey(r => r.id / bucketSize)
      .transformWithState(
        new Processor(bucketSize, startId),
        TimeMode.None(),
        OutputMode.Update())
  }

  /** Missing runs strictly below the max seen id of the bucket
    * (never below startId — the sequence begins there), read straight
    * off the bitmap.
    */
  private[graft] def openGaps(bucket: Long, bits: Array[Byte],
                                  bucketSize: Long,
                                  startId: Long = 1L): Seq[(Long, Long)] = {
    val base = bucket * bucketSize
    def isSet(off: Int): Boolean = (bits(off >> 3) & (1 << (off & 7))) != 0
    var hi = -1L
    var off = (bucketSize - 1).toInt
    while (off >= 0 && hi < 0) {
      if (isSet(off)) hi = base + off
      off -= 1
    }
    if (hi < 0) return Seq.empty
    val lo = math.max(base, startId)
    val gaps = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var runStart = -1L
    var id = lo
    while (id < hi) {
      if (!isSet((id - base).toInt)) {
        if (runStart < 0) runStart = id
      } else if (runStart >= 0) {
        gaps += ((runStart, id - 1))
        runStart = -1
      }
      id += 1
    }
    if (runStart >= 0) gaps += ((runStart, hi - 1))
    gaps.toSeq
  }
}
