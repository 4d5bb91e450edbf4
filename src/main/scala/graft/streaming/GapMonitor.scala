package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live gap detection as arbitrary stateful streaming — the
  * reference's CheckAndDump scan (replication/replication.go:339-460)
  * as a `flatMapGroupsWithState` operator, instead of the batch
  * anti-join twin in [[ReplicatedLog.gapRanges]].
  *
  * Ids are grouped into fixed-width buckets (id div bucketSize) so
  * state is per-bucket and bounded: each group holds at most
  * `bucketSize` ids, and buckets distribute across executors — the
  * global-order problem the batch scan has is gone. After every
  * micro-batch each touched bucket re-emits its currently-open gaps
  * (start..end runs of missing ids below the bucket's high-water
  * mark), mirroring the 10 s rescan loop.
  */
object GapMonitor {

  case class GapEvent(bucket: Long, gapStart: Long, gapEnd: Long)

  case class BucketState(seen: Seq[Long])

  def monitor(stream: Dataset[ReplicatedLog.LogRecord],
              bucketSize: Long = 1000L,
              startId: Long = 1L): Dataset[GapEvent] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .groupByKey(r => r.id / bucketSize)
      .flatMapGroupsWithState[BucketState, GapEvent](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (bucket: Long, rows: Iterator[ReplicatedLog.LogRecord],
         state: GroupState[BucketState]) =>
          val prev = state.getOption.map(_.seen.toSet).getOrElse(Set.empty)
          val seen = prev ++ rows.map(_.id)
          state.update(BucketState(seen.toSeq.sorted))
          openGaps(bucket, seen, bucketSize, startId).iterator
      }
  }

  /** Missing runs strictly below the max seen id of the bucket
    * (never below startId — the sequence begins there).
    */
  private[streaming] def openGaps(bucket: Long, seen: Set[Long],
                                  bucketSize: Long,
                                  startId: Long = 1L): Seq[GapEvent] = {
    if (seen.isEmpty) return Seq.empty
    val lo = math.max(bucket * bucketSize, startId)
    val hi = seen.max
    val gaps = scala.collection.mutable.ArrayBuffer.empty[GapEvent]
    var runStart = -1L
    var id = lo
    while (id < hi) {
      if (!seen.contains(id)) {
        if (runStart < 0) runStart = id
      } else if (runStart >= 0) {
        gaps += GapEvent(bucket, runStart, id - 1)
        runStart = -1
      }
      id += 1
    }
    if (runStart >= 0) gaps += GapEvent(bucket, runStart, hi - 1)
    gaps.toSeq
  }
}
