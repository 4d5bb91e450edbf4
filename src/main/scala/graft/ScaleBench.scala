package graft

import org.apache.spark.sql.functions.{col, lit}

/** Heavier-SF benchmark point: replicates the largest driver-provided
  * dataset (sf0.1) K times with ids offset per copy — facts and
  * entity tables get disjoint key ranges, region/nation stay fixed,
  * event user_ids stay fixed (same user base, more activity each) —
  * writes it under target/, then times every registered query on it
  * with the same protocol as [[Bench]].
  *
  * This is a bench-only mechanical replication of the driver's data
  * (TESTDATA.md inputs), not synthetic test data: correctness is
  * gated at sf0.01 by the DuckDB oracle; this main exists to measure
  * how the plans scale (fixed-overhead amortization, no
  * super-linear blowups) one step beyond sf0.1.
  *
  * Usage: runMain graft.ScaleBench [K] [srcDir] [outDir] [queriesCsv] [tablesCsv]
  *
  * `queriesCsv` restricts the timed set (default: all registered
  * queries) and `tablesCsv` the replicated tables (default: all) —
  * the 50x point times only the flagship scale paths, whose brute
  * twins are exactly the plans that would explode there.
  */
object ScaleBench {

  /** Id columns to offset per copy; absent/empty = copy once only. */
  private val idCols: Map[String, Seq[String]] = Map(
    "region" -> Nil,
    "nation" -> Nil,
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  // far above every base id, so copies occupy disjoint ranges and
  // cross-table joins stay consistent (the same offset applies to a
  // key and every foreign reference to it)
  private val Offset = 100000000L

  /** Extract the per-query count-mode numbers from a prior sweep's
    * JSON line (the `SPARK_GRAFT_SCALE_PRIOR` input to the movement
    * gate). Regex-scoped to the `"queries"` object so retime/full/
    * build maps never contaminate the counts; ScaleBenchPriorSpec
    * pins it against the committed r14 artifact.
    */
  private[graft] def parsePriorCounts(text: String): Map[String, Double] = {
    val q = "\"queries\"\\s*:\\s*\\{([^}]*)\\}".r
      .findFirstMatchIn(text).map(_.group(1)).getOrElse("")
    "\"([^\"]+)\"\\s*:\\s*(-?[0-9.Ee+-]+)".r.findAllMatchIn(q)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(5)
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val out = if (args.length > 2) args(2) else s"target/scaled_${k}x"
    // "ALL" = the full registered set (placeholder so tablesCsv can
    // be given positionally without restricting the queries)
    val querySet = if (args.length > 3 && args(3) != "ALL")
                     args(3).split(",").toSet
                   else SparkEntry.queries.keySet
    val tableSet = if (args.length > 4) args(4).split(",").toSet
                   else idCols.keySet
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus, 4]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // events.ts is TIMESTAMP(NANOS); the GraftSession-level
    // nanosAsLong flag reads it as a raw ns long, and it is written
    // back as a plain long — Tables.events handles both
    for ((t, cols) <- idCols.toSeq.sortBy(_._1) if tableSet(t)) {
      val base = spark.read.parquet(s"$src/$t.parquet")
      val scaled =
        if (cols.isEmpty || k == 1) base
        else (0 until k).map { c =>
          cols.foldLeft(base) { (df, cn) =>
            df.withColumn(cn, col(cn) + lit(c.toLong * Offset))
          }
        }.reduce(_ unionAll _)
      scaled.write.mode("overwrite").parquet(s"$out/$t.parquet")
    }

    // Codec fixture: persist the four codec queries' payload corpora
    // next to the scaled tables, so mm_decode/mm_resize/dedup_image/
    // dedup_audio measure DECODE-only here — a real corpus stores its
    // media; per-query ENCODE was fixture overhead reading as query
    // cost (round-12 verdict item 5). Regenerated whenever documents
    // was (re)replicated this run, so K changes can't leave a stale
    // id set behind.
    if (tableSet("documents"))
      operators.Multimodal.writeCodecFixtures(spark, out)

    spark.range(1000000).selectExpr("sum(id)").collect()
    // single-threaded codec JIT warm-up — see the
    // Multimodal.warmCodecPaths scaladoc for the C2-starvation story
    operators.Multimodal.warmCodecPaths()
    // Per-query wall-clock budget: the exhaustive sweep deliberately
    // includes the brute differential twins (inverted-index Jaccard,
    // the full recall audit) whose documented fate on a
    // clone-replicated rung is quadratic death — they must RECORD
    // that honestly (-2) without hanging the other ~135 queries. The
    // runner thread sets its own job group (job groups are
    // thread-local) so the cancel reaches the in-flight stages.
    val timeoutSec =
      sys.env.get("SPARK_GRAFT_SCALE_TIMEOUT").map(_.toInt).getOrElse(240)
    // Dedicated thread per measurement, JOINED after a cancel: the
    // first cut ran queries on the global ExecutionContext and
    // abandoned the Future on timeout, so the cancelled job's teardown
    // (stage cleanup, shuffle file deletion) overlapped the NEXT
    // query's timing window. The join (bounded — interruptOnCancel
    // makes the stages die promptly) keeps measurements disjoint; a
    // thread that ignores the cancel past the grace period is reported
    // loudly instead of silently contaminating the sweep. Failures log
    // their exception before recording -1 (the blanket swallow hid
    // the difference between OOM and a missing table).
    def timed(tag: String)(run: => Unit): Double = {
      val sc = spark.sparkContext
      @volatile var err: Throwable = null
      val t0 = System.nanoTime()
      val th = new Thread(() => {
        sc.setJobGroup(tag, tag, interruptOnCancel = true)
        try run
        catch { case t: Throwable => err = t }
        finally sc.clearJobGroup()
      }, s"scalebench-$tag")
      th.start()
      th.join(timeoutSec * 1000L)
      if (th.isAlive) {
        sc.cancelJobGroup(tag)
        th.join(60000L) // let the cancelled job settle before the next query
        if (th.isAlive)
          System.err.println(s"[scale] WARNING: $tag still running 60 s after cancel")
        -2.0
      } else if (err != null) {
        System.err.println(s"[scale] $tag FAILED: ${err.getClass.getName}: ${err.getMessage}")
        -1.0
      } else (System.nanoTime() - t0) / 1e9
    }
    // count-based (ladder-comparable) AND noop-sink full evaluation —
    // same two-protocol rationale as [[Bench]]: count() lets the
    // optimizer prune expression work and even whole joins, so a
    // ladder rung can read fake-flat while the real cost grows
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
        .filter(q => querySet(q._1)).map { case (name, fn) =>
      // Bench's build/steady split, extended to the sweep (round 13):
      // the build-backed queries memoize a one-time index/model per
      // (JVM, corpus dir), so their FIRST call here would land the
      // build inside the count-mode number (observed: an _idx row
      // reading 14.0 s count vs 1.76 s full purely from build order).
      // One untimed-for-count warm call pays the build and is
      // reported as its own column.
      val build =
        if (SparkEntry.buildBackedQueries(name))
          timed(s"scale-build-$name") { fn(spark, out).count() }
        else 0.0
      if (build != 0.0) System.gc()
      val dt = timed(s"scale-count-$name") { fn(spark, out).count() }
      System.gc()
      val dtf = timed(s"scale-full-$name") {
        fn(spark, out).write.format("noop").mode("overwrite").save()
      }
      System.gc()
      System.err.println(
        f"[scale] $name%-28s count=$dt%8.2f full=$dtf%8.2f" +
          (if (build != 0.0) f" build=$build%8.2f" else ""))
      (name, dt, dtf, build)
    }
    // Variance gate, extended from [[Bench]] to the sweep (round-13
    // verdict ask): the sweep reports ONE-SHOT numbers per protocol
    // mode, and the degraded-box rounds showed that is exactly where
    // interference noise lands. Two flag conditions, both judged only
    // above a 1 s floor (sub-second swings are scheduling jitter):
    //  - count vs full disagree by > 2× in EITHER direction beyond
    //    what expression/output work explains — a cheap self-check
    //    available without any external state;
    //  - the number moved ≥ 2× from the prior round's sweep, when a
    //    prior artifact is supplied via SPARK_GRAFT_SCALE_PRIOR
    //    (path to last round's JSON line).
    // Flagged queries re-time at the post-sweep quiet interval (no
    // other query's cancelled stages or shuffle cleanup overlap; GC
    // before each run): count mean±sd of 3 plus one full run, so the
    // artifact adjudicates its own noise like BENCH does.
    val priorCounts: Map[String, Double] =
      sys.env.get("SPARK_GRAFT_SCALE_PRIOR").map { p =>
        parsePriorCounts(scala.io.Source.fromFile(p).mkString)
      }.getOrElse(Map.empty)
    val RetimeFloorSec = 1.0
    // Disagreement flags fire ONLY when count exceeds 2× full:
    // full >> count is STRUCTURAL for most of the registry (count()
    // prunes expression work, final sorts, even row-preserving
    // joins — the two-protocol rationale), and the first full r14
    // sweep proved an exemption list can't capture that (40 rows
    // flagged, nearly all structural). count ABOVE full, by
    // contrast, is never explained by pruning — count can only
    // remove work — so it always means interference or a cold path
    // (the r14 calm sweep caught mm_resize at count=72 s vs
    // full=15.7 s exactly this way). Cross-round movement vs the
    // prior sweep artifact (tools/scale_sweep_r14.json onward, via
    // SPARK_GRAFT_SCALE_PRIOR) covers the full-side regressions the
    // disagreement flag no longer watches.
    val flagged = results.collect { case (n, c, f, _)
        if c >= 0 && f >= 0 && math.max(c, f) >= RetimeFloorSec &&
          ((c > 2.0 * math.max(f, 0.05)) ||
           priorCounts.get(n).exists(p =>
             p >= RetimeFloorSec && math.max(c / p, p / c) >= 2.0)) => n
    }
    val retimes = flagged.map { name =>
      val fn = SparkEntry.queries(name)
      val runs = Seq.fill(3) {
        System.gc()
        timed(s"scale-retime-$name") { fn(spark, out).count() }
      }.filter(_ >= 0)
      System.gc()
      val rf = timed(s"scale-retime-full-$name") {
        fn(spark, out).write.format("noop").mode("overwrite").save()
      }
      val m = if (runs.isEmpty) -1.0 else runs.sum / runs.size
      val sd = if (runs.size < 2) 0.0
        else math.sqrt(runs.map(x => (x - m) * (x - m)).sum / (runs.size - 1))
      System.err.println(f"[scale] RETIME $name%-24s count=$m%8.2f sd=$sd%6.2f full=$rf%8.2f")
      (name, m, sd, rf)
    }
    val qs = results.map { case (n, v, _, _) => "\"" + n + "\":" + v }
      .mkString("{", ",", "}")
    val fulls = results.map { case (n, _, f, _) => "\"" + n + "\":" + f }
      .mkString("{", ",", "}")
    val builds = results.collect { case (n, _, _, b) if b != 0.0 =>
        "\"" + n + "\":" + b }
      .mkString("{", ",", "}")
    val rts = retimes.map { case (n, m, _, _) => "\"" + n + "\":" + m }
      .mkString("{", ",", "}")
    val rtSds = retimes.map { case (n, _, sd, _) => "\"" + n + "\":" + sd }
      .mkString("{", ",", "}")
    val rtFulls = retimes.map { case (n, _, _, f) => "\"" + n + "\":" + f }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val totalFull = results.map(_._3).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","total_full":$totalFull,""" +
      s""""queries":$qs,"queries_full":$fulls,"queries_build":$builds,""" +
      s""""queries_retime":$rts,"queries_retime_sd":$rtSds,"queries_retime_full":$rtFulls,""" +
      s""""sf":"${k}x sf0.1 (~sf${0.1 * k})"}""")
    spark.stop()
  }
}
