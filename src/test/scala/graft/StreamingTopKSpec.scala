package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingTopK

/** Live heavy hitters: the incremental space-saving summary must
  * carry the same guarantee as the batch sketch — every term with
  * true frequency > N/capacity survives in state — and counts must
  * be exact when the vocabulary fits in capacity (no evictions).
  */
class StreamingTopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("counts are exact across batches when vocabulary fits capacity") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingTopK.topK(in.toDS(), capacity = 16, emitK = 5)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("update").start()
    try {
      in.addData((0L, "a"), (0L, "a"), (0L, "b"), (0L, "c"))
      q.processAllAvailable()
      in.addData((0L, "a"), (0L, "b"), (0L, "b"), (0L, "b"))
      q.processAllAvailable()
      // latest batch's emission for shard 0: a=3, b=4, c=1
      val rows = spark.table("topk_out")
        .select("rank", "term", "cnt").as[(Int, String, Long)]
        .collect().toSeq
      val latest = rows.takeRight(3)
      assert(latest == Seq((1, "b", 4L), (2, "a", 3L), (3, "c", 1L)))
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 1L,
        "one state row per shard")
    } finally q.stop()
  }

  test("heavy hitters survive eviction pressure (space-saving guarantee)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingTopK.topK(in.toDS(), capacity = 4, emitK = 2)
      .writeStream.format("memory").queryName("topk_out2")
      .outputMode("update").start()
    try {
      // 40 occurrences of "hot", 16 distinct cold terms once each:
      // N = 56, capacity 4 -> anything with freq > 14 must survive
      val hot = Seq.fill(40)((0L, "hot"))
      val cold = (1 to 16).map(i => (0L, s"cold$i"))
      in.addData(scala.util.Random.shuffle(hot ++ cold): _*)
      q.processAllAvailable()
      val top = spark.table("topk_out2")
        .select("rank", "term", "cnt").as[(Int, String, Long)]
        .collect().toSeq
      assert(top.exists { case (r, t, c) => r == 1 && t == "hot" && c >= 40 },
        s"hot term must head the summary, got $top")
    } finally q.stop()
  }

  test("shards are independent state rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = StreamingTopK.topK(in.toDS(), capacity = 8, emitK = 2)
      .writeStream.format("memory").queryName("topk_out3")
      .outputMode("update").start()
    try {
      in.addData((0L, "x"), (0L, "x"), (1L, "y"))
      q.processAllAvailable()
      val rows = spark.table("topk_out3")
        .select("shard", "rank", "term", "cnt").as[(Long, Int, String, Long)]
        .collect().toSet
      assert(rows == Set((0L, 1, "x", 2L), (1L, 1, "y", 1L)))
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 2L)
    } finally q.stop()
  }
}
