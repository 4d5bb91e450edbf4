package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.scalatest.funsuite.AnyFunSuite

/** SCALE.md claims "sorts spill, nothing limits scale" — this spec
  * proves it instead of asserting it: queries run with buffers capped
  * low enough to force real disk spills (and the hash aggregate
  * forced into its sort-based fallback), and output must be identical
  * to the clean run while the spill metrics are nonzero.
  *
  * The spill knobs are runtime SQLConfs (window buffer thresholds,
  * aggregate fallback row count), so the stress applies per-test
  * without restarting the context; shuffle partitions are also raised
  * to a prime to shake out partitioning assumptions.
  */
class SpillSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  // the stress paths are deliberately pathological (spilled
  // running-frame buffers re-read from disk per row; sort-fallback
  // aggregation re-sorts per input batch), so the tests run on the
  // smallest SF — they prove the correctness property in seconds
  // instead of minutes of tiny-file I/O, without weakening the claim
  val sfSmall = "/root/testdata/sf0.001"

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Runs body while summing executor spill metrics across tasks. */
  private def countingSpills[T](body: => T): (T, Long) = {
    val spilled = new AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val tm = t.taskMetrics
        if (tm != null)
          spilled.addAndGet(tm.diskBytesSpilled + tm.memoryBytesSpilled)
      }
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    try {
      val r = body
      org.apache.spark.graft.ListenerBridge.waitUntilListenerBusEmpty(sc)
      (r, spilled.get())
    } finally sc.removeSparkListener(listener)
  }

  test("window query spills to disk under capped buffers and stays correct") {
    val q8 = SparkEntry.queries("q8_running_total")
    val clean = q8(spark, sfSmall).collect()
    withConf(
      // every window partition holds more rows than this (~15/key at
      // sf0.01), so each is forced through the external sorter onto
      // disk — but only a couple of spill files per partition, not one
      // per row (threshold 2 measured minutes of tiny-file I/O)
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "4",
      "spark.sql.windowExec.buffer.spill.threshold" -> "8",
      "spark.sql.shuffle.partitions" -> "31") {
      val (stressed, spilled) = countingSpills { q8(spark, sfSmall).collect() }
      info(s"window stress spilled $spilled bytes over ${stressed.length} rows")
      assert(spilled > 0L, "capped window buffers must actually spill")
      assert(stressed.toSeq == clean.toSeq,
        "spilling run diverged from in-memory run")
    }
  }

  test("hash aggregate survives forced sort-based fallback") {
    val q1 = SparkEntry.queries("q1_pricing_summary")
    val clean = q1(spark, sfSmall).collect()
    withConf(
      // fall back to sort-based aggregation after 2 hash-map keys
      // (partial) / 3 (final) — q1 has 6 groups, so both phases take
      // the sort path for most of their input
      "spark.sql.TungstenAggregate.testFallbackStartsAt" -> "2, 3",
      "spark.sql.shuffle.partitions" -> "31") {
      val stressed = q1(spark, sfSmall).collect()
      assert(stressed.toSeq == clean.toSeq,
        "sort-fallback aggregation diverged from hash aggregation")
    }
  }

  test("exact percentiles spill their sort and stay bit-identical") {
    // the round-10 percentile rewrite exists for exactly this: the
    // built-in percentile() buffers a group's whole distribution with
    // NO spill path, while sortedPercentiles ranks through WindowExec,
    // whose external sorter spills. Force the spill and require the
    // answer unchanged — the claim "exact percentiles survive groups
    // that exceed memory" as a measured property, not prose.
    val q19 = SparkEntry.queries("q19_percentiles")
    val clean = q19(spark, sfSmall).collect()
    withConf(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "4",
      "spark.sql.windowExec.buffer.spill.threshold" -> "8",
      "spark.sql.shuffle.partitions" -> "31") {
      val (stressed, spilled) = countingSpills { q19(spark, sfSmall).collect() }
      info(s"percentile stress spilled $spilled bytes")
      assert(spilled > 0L, "capped window buffers must actually spill")
      assert(stressed.toSeq == clean.toSeq,
        "spilled percentile run diverged from the in-memory run")
    }
  }

  test("SCD2 run compression spills its per-user windows and stays exact") {
    // evt_scd2's lag + running-sum pass rides WindowExec; the CDC
    // output (run boundaries, from/to spans) must survive the
    // external sorter — a power user's event history IS the partition
    // that exceeds memory at 100 TB
    val scd2 = SparkEntry.queries("evt_scd2")
    val clean = scd2(spark, sfSmall).collect()
    withConf(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "4",
      "spark.sql.windowExec.buffer.spill.threshold" -> "8",
      "spark.sql.shuffle.partitions" -> "31") {
      val (stressed, spilled) = countingSpills { scd2(spark, sfSmall).collect() }
      info(s"scd2 stress spilled $spilled bytes over ${stressed.length} runs")
      assert(spilled > 0L, "capped window buffers must actually spill")
      assert(stressed.toSeq == clean.toSeq,
        "spilled scd2 run diverged from the in-memory run")
    }
  }

  test("compaction packing stays exact under spill-pressure confs") {
    // no spilled>0 assertion here, and that is the point: prefixSumBy
    // fragments each source across range buckets, so its window
    // partitions are bounded by construction (rows/buckets per
    // source) and stay UNDER even this 4-row cap at the small SF —
    // the single-reducer window this operator replaces is the one
    // that would have spilled
    val comp = SparkEntry.queries("ops_compaction")
    val clean = comp(spark, sfSmall).collect()
    withConf(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "4",
      "spark.sql.windowExec.buffer.spill.threshold" -> "8",
      "spark.sql.shuffle.partitions" -> "31") {
      val (stressed, spilled) = countingSpills { comp(spark, sfSmall).collect() }
      info(s"compaction stress spilled $spilled bytes (bounded partitions)")
      assert(stressed.toSeq == clean.toSeq,
        "stressed compaction plan diverged from the in-memory run")
    }
  }

  test("TopKPerGroup stays correct under spill-pressure confs (bounded state)") {
    val q7 = SparkEntry.queries("q7_top_orders_per_customer")
    val clean = q7(spark, sfSmall).collect()
    withConf(
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "4",
      "spark.sql.windowExec.buffer.spill.threshold" -> "8",
      "spark.sql.shuffle.partitions" -> "31") {
      val (stressed, spilled) = countingSpills { q7(spark, sfSmall).collect() }
      info(s"topk stress spilled $spilled bytes (heap state is k-bounded)")
      assert(stressed.toSeq == clean.toSeq)
    }
  }
}
