package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-scale physical-layout tooling: bucketing for co-located
  * joins and salting for skewed keys. These are the knobs a 100 TB
  * deployment turns that the test SFs don't need — implemented and
  * spec-verified here so the layout contracts are real code, not
  * documentation.
  */
object ScaleOps {

  import org.apache.spark.sql.Column

  /** Bit-spread of a 16-bit value (bit i → bit 2i) — the classic
    * 4-step magic-mask sequence, composed from BUILT-IN long
    * arithmetic so it stays inside whole-stage codegen and has a
    * verbatim SQL mirror ([[spread16Sql]]) for the DuckDB oracle.
    */
  def spread16(c: Column): Column = {
    val a = c.bitwiseAND(lit(65535L))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val e = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val f = e.bitwiseOR(shiftleft(e, 2)).bitwiseAND(lit(0x33333333L))
    f.bitwiseOR(shiftleft(f, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton/Z-value of two 16-bit quantized dimensions: x in even
    * bits, y in odd bits. Sorting or tiling by this value gives a
    * layout whose contiguous ranges are BOUNDED IN BOTH dimensions —
    * the multi-column data-skipping layout (Z-ordering) behind
    * `ops_zorder`'s audit.
    */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** DuckDB mirror of [[spread16]] applied to SQL expression `e`. */
  def spread16Sql(e: String): String = {
    val a = s"(($e) & 65535)"
    val b = s"(($a | ($a << 8)) & 16711935)"
    val c = s"(($b | ($b << 4)) & 252645135)"
    val d = s"(($c | ($c << 2)) & 858993459)"
    s"(($d | ($d << 1)) & 1431655765)"
  }

  /** DuckDB mirror of [[zValue]]. */
  def zValueSql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"

  /** EXACT per-group percentiles with `percentile()`'s linear
    * interpolation, computed through a rank window instead of the
    * built-in aggregate. The built-in buffers a group's ENTIRE value
    * distribution in one executor's aggregation hashmap — the one
    * memory-UNBOUNDED aggregate shape a 100 TB group can kill.
    * This form sorts per group inside WindowExec, whose
    * UnsafeExternalSorter SPILLS to disk, then keeps only the ≤ 2
    * order statistics each percentile interpolates between — the
    * aggregate downstream of the sort sums at most 2·|ps| rows per
    * group. Same per-group parallelism as the built-in (one task per
    * group either way), strictly better memory behavior.
    *
    * Interpolation reproduces Spark's `Percentile.getPercentile`
    * bit-for-bit: pos = p·(n−1) on doubles, result =
    * v[lo]·(hi−pos) + v[hi]·(pos−lo) (v[lo] alone when hi == lo),
    * with n counting non-null values only.
    *
    * @param ps (percentile, output column name) pairs
    */
  def sortedPercentiles(df: DataFrame, key: String, value: String,
                        ps: Seq[(Double, String)]): DataFrame = {
    val vals = df.select(col(key), col(value).cast("double").as(value))
      .filter(col(value).isNotNull)
    // group size via an unbounded frame over the SAME sorted window —
    // one exchange + one sort, and crucially the input has exactly ONE
    // consumer (a groupBy-count + rejoin would add a second consumer
    // with different column pruning, defeating upstream exchange
    // reuse — the ccnet/DSIR lesson)
    val w = Window.partitionBy(col(key)).orderBy(col(value))
    val ranked = vals
      .withColumn("__rnk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    def pos(p: Double) = lit(p) * (col("__n") - 1).cast("double")
    val isCandidate = ps.map { case (p, _) =>
      (col("__rnk") - 1 === floor(pos(p))) ||
        (col("__rnk") - 1 === ceil(pos(p)))
    }.reduce(_ || _)
    // collect the two order statistics per percentile, then
    // interpolate POST-aggregate, mirroring Percentile.getPercentile
    // exactly — including its short-circuit on VALUE equality (equal
    // lo/hi values return the value itself, no (hi−pos)+(pos−lo)
    // weight arithmetic whose rounding could differ by an ulp)
    val aggs = ps.flatMap { case (p, name) =>
      Seq(max(when(col("__rnk") - 1 === floor(pos(p)), col(value)))
            .as(s"__lo_$name"),
          max(when(col("__rnk") - 1 === ceil(pos(p)), col(value)))
            .as(s"__hi_$name"))
    } :+ max(col("__n")).as("__gn")
    val out = ps.map { case (p, name) =>
      val gpos = lit(p) * (col("__gn") - 1).cast("double")
      val loV = col(s"__lo_$name")
      val hiV = col(s"__hi_$name")
      when(loV === hiV, loV)
        .otherwise((ceil(gpos).cast("double") - gpos) * loV +
                   (gpos - floor(gpos).cast("double")) * hiV)
        .as(name)
    }
    ranked.filter(isCandidate)
      .groupBy(col(key))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(key) +: out: _*)
  }

  /** EXACT global percentiles over a WEIGHTED value distribution
    * ((value, weight) rows ≡ `weight` copies of `value`) — the
    * scalable form of an UNGROUPED `percentile()`: where
    * [[sortedPercentiles]] sorts per group, a global percentile has
    * no group to partition by, and a single-partition window is
    * banned suite-wide. Instead the caller pre-aggregates to
    * value frequencies (for per-key-count skew stats that table is
    * counts-of-COUNTS — its size is the number of distinct counts,
    * tiny regardless of key count) and the cumulative weight comes
    * from the bucketed [[prefixSum]] (range-bucketed local sums +
    * broadcast carries — no global window). Each percentile then
    * needs the ≤ 2 rows whose cumulative interval covers its
    * interpolation indices; interpolation mirrors
    * `Percentile.getPercentile` exactly, including the value-equality
    * short-circuit.
    */
  def weightedPercentiles(freq: DataFrame, value: String, weight: String,
                          ps: Seq[(Double, String)]): DataFrame = {
    val cum = prefixSum(
        freq.select(col(value).cast("double").as(value),
                    col(weight).cast("long").as(weight)),
        value, weight, "__cum")
      .crossJoin(broadcast(
        freq.agg(sum(col(weight)).cast("double").as("__n"))))
    def pos(p: Double) = lit(p) * (col("__n") - 1).cast("double")
    // a row covers expanded indices [__cum − weight, __cum)
    def covers(idx: org.apache.spark.sql.Column) =
      (col("__cum") - col(weight) <= idx) && (idx < col("__cum"))
    val isCandidate = ps.map { case (p, _) =>
      covers(floor(pos(p))) || covers(ceil(pos(p)))
    }.reduce(_ || _)
    val aggs = ps.flatMap { case (p, name) =>
      Seq(max(when(covers(floor(pos(p))), col(value))).as(s"__lo_$name"),
          max(when(covers(ceil(pos(p))), col(value))).as(s"__hi_$name"))
    } :+ max(col("__n")).as("__gn")
    val out = ps.map { case (p, name) =>
      val gpos = lit(p) * (col("__gn") - 1).cast("double")
      val loV = col(s"__lo_$name")
      val hiV = col(s"__hi_$name")
      when(loV === hiV, loV)
        .otherwise((ceil(gpos).cast("double") - gpos) * loV +
                   (gpos - floor(gpos).cast("double")) * hiV)
        .as(name)
    }
    cum.filter(isCandidate)
      .agg(aggs.head, aggs.tail: _*)
      .select(out: _*)
  }

  /** Persist a DataFrame bucketed+sorted by join key. Two tables
    * bucketed the same way join with ZERO shuffle (SortMergeJoin over
    * pre-bucketed scans) — the co-located-join layout for repeated
    * fact-fact joins.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Persist a DataFrame under a Hive-style partitioned layout
    * (`col=value/` directories). Readers with an equality/IN
    * predicate on the partition column scan ONLY the matching
    * directories — directory-level pruning, the coarsest and
    * cheapest data-skipping tier, sitting above row-group skipping
    * ([[zValue]]-sorted files) and below bucketing
    * ([[writeBucketed]]). Partition by LOW-cardinality columns only
    * (lang, source, date): a high-cardinality partition key shatters
    * the table into the small-file problem [[graft.operators
    * .Relational.opsCompaction]] exists to fix.
    * `PartitionPruningSpec` proves the pruning on real file counts.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: String*): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Per-group top-k through the custom [[graft.plans.TopKPerGroup]]
    * operator (logical node + strategy + exec injected by
    * GraftExtensions): unlike the window row_number plan, a map-side
    * partial phase caps shuffle volume at k rows per key per input
    * partition. Appends a 1-based `rankName` column with exactly
    * row_number() semantics.
    *
    * `orderBy` is (column, descending?) pairs; make it a total order
    * per key (add a tiebreak id) for deterministic output.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String],
                 orderBy: Seq[(String, Boolean)], k: Int,
                 rankName: String = "rank"): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Descending, SortOrder}
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types.IntegerType
    val plan = ColumnBridge.analyzed(df)
    def attr(n: String) = plan.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(
        s"column $n not in ${plan.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending) }
    val rank = AttributeReference(rankName, IntegerType, nullable = false)()
    ColumnBridge.ofRows(df.sparkSession,
      graft.plans.TopKPerGroup(keys.map(attr), order, k, rank, plan))
  }

  /** Distributed gaps-and-islands over an id sequence — the scalable
    * form of `lag(id) OVER (ORDER BY id)`. A global-order window
    * moves ALL rows to one partition (Spark warns exactly that); here
    * ids are range-bucketed with `width_bucket`, lag runs per bucket
    * (parallel, spillable), and the only cross-bucket state is one
    * max per bucket, carried via a broadcast join of a <=`buckets`-row
    * table. Same output as the global window, no single-partition
    * stage — survives any id-sequence size.
    *
    * `startId`: when set, the sequence is expected to begin there and
    * a leading hole [startId, first-1] is reported (the reference's
    * replication scan starts at id 1, replication.go:345-406).
    *
    * `buckets` ≤ 0 (the default) derives the bucket count from
    * `spark.sql.shuffle.partitions`: the bucket count IS the stage's
    * parallelism, and a hardcoded constant would cap a 1000-executor
    * cluster's gap scan at that constant while leaving each bucket
    * N/constant rows through one window task.
    */
  def gapRanges(observed: DataFrame, idCol: String = "id",
                startId: Option[Long] = None, buckets: Int = -1): DataFrame = {
    val nBuckets = sessionBuckets(observed, buckets)
    val obs = observed.select(col(idCol).cast("long").as("id")).distinct()
    // id-range bounds folded in as a broadcast scalar (width_bucket
    // takes column bounds) — the whole thing is ONE lazy plan, not a
    // driver-side min/max job followed by the query
    val mm = obs.agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
      .select(col("mn"), col("mx"),
        greatest(lit(1L), least(lit(nBuckets.toLong), col("mx") - col("mn") + 1))
          .cast("int").as("nb"))
    val b = obs.crossJoin(broadcast(mm))
      .withColumn("bucket",
        width_bucket(col("id"), col("mn"), col("mx") + 1, col("nb")))
      .drop("mn", "mx", "nb")
    val w = Window.partitionBy(col("bucket")).orderBy(col("id"))
    val bmax = b.groupBy(col("bucket")).agg(max(col("id")).as("bmax"))
    val carry = bmax.as("a")
      .join(bmax.as("b"), col("b.bucket") < col("a.bucket"))
      .groupBy(col("a.bucket").as("bucket"))
      .agg(max(col("b.bmax")).as("carry"))
    b.withColumn("prev", lag(col("id"), 1).over(w))
      .join(broadcast(carry), Seq("bucket"), "left")
      .withColumn("prev", coalesce(col("prev"), col("carry"),
        startId.map(s => lit(s - 1)).getOrElse(lit(null).cast("long"))))
      .filter(col("prev").isNotNull && col("id") - col("prev") > 1)
      .select((col("prev") + 1).as("gap_start"), (col("id") - 1).as("gap_end"))
      .orderBy(col("gap_start"))
  }

  /** Distributed prefix sum over a unique ordering column — the
    * scalable form of `sum(v) OVER (ORDER BY ord)`. A global-order
    * window moves every row to one partition; here rows are
    * range-bucketed on the order column (bounds folded in as a
    * broadcast scalar, same trick as [[gapRanges]]), the running sum
    * runs per bucket (parallel, spillable), and the only cross-bucket
    * state is one total per bucket, combined into an exclusive carry
    * and broadcast back. Output: input rows + `outCol` = inclusive
    * prefix sum in `orderCol` order.
    *
    * `buckets` ≤ 0 (the default) derives the bucket count from
    * `spark.sql.shuffle.partitions` — see [[gapRanges]].
    */
  def prefixSum(df: DataFrame, orderCol: String, valueCol: String,
                outCol: String = "cum", buckets: Int = -1): DataFrame = {
    val nBuckets = sessionBuckets(df, buckets)
    val obs = df.withColumn("__ord", col(orderCol).cast("long"))
    val mm = obs.agg(min(col("__ord")).as("mn"), max(col("__ord")).as("mx"))
      .select(col("mn"), col("mx"),
        greatest(lit(1L), least(lit(nBuckets.toLong), col("mx") - col("mn") + 1))
          .cast("int").as("nb"))
    val b = obs.crossJoin(broadcast(mm))
      .withColumn("__bucket",
        width_bucket(col("__ord"), col("mn"), col("mx") + 1, col("nb")))
      .drop("mn", "mx", "nb")
    // window orders by the RAW column, not the truncated __ord: the
    // long cast exists only for bucketing (truncation is monotone, so
    // bucket ranges respect value order), but distinct non-integer
    // values colliding on one long would be RANGE-frame peers sharing
    // one cumulative sum — a wrong prefix sum for double-valued inputs
    // (e.g. weightedPercentiles over fractional values)
    val w = Window.partitionBy(col("__bucket")).orderBy(col(orderCol))
    val local = b.withColumn("__local", sum(col(valueCol)).over(w))
    // bucket totals as a real sum — NOT max of the running sum, which
    // breaks for negative values (caught by DistributedAlgoPropertySpec)
    val btot = b.groupBy(col("__bucket")).agg(sum(col(valueCol)).as("__btot"))
    val carry = btot.as("a")
      .join(btot.as("b"), col("b.__bucket") < col("a.__bucket"))
      .groupBy(col("a.__bucket").as("__bucket"))
      .agg(sum(col("b.__btot")).as("__carry"))
    local.join(broadcast(carry), Seq("__bucket"), "left")
      .withColumn(outCol, col("__local") + coalesce(col("__carry"), lit(0L)))
      .drop("__bucket", "__local", "__carry", "__ord")
  }

  /** Grouped [[prefixSum]]: an independent running sum per `groupCol`
    * value — the scalable form of
    * `sum(v) OVER (PARTITION BY g ORDER BY ord)` when single groups
    * are themselves too large for one reducer (a per-source corpus at
    * 100 TB). Same range-bucket trick, with buckets CROSSED with the
    * group key: local sums run per (group, bucket) — parallel even
    * inside one giant group — and the carry table (one row per
    * occupied (group, bucket), built by a triangular self-join of the
    * per-bucket totals) broadcasts back. Carry size is
    * groups × buckets rows; for group cardinalities where that
    * outgrows a broadcast, drop the `broadcast` hint and the carry
    * join degrades gracefully to a shuffle join on (group, bucket).
    */
  def prefixSumBy(df: DataFrame, groupCol: String, orderCol: String,
                  valueCol: String, outCol: String = "cum",
                  buckets: Int = -1): DataFrame = {
    val nBuckets = sessionBuckets(df, buckets)
    val obs = df.withColumn("__ord", col(orderCol).cast("long"))
    val mm = obs.agg(min(col("__ord")).as("mn"), max(col("__ord")).as("mx"))
      .select(col("mn"), col("mx"),
        greatest(lit(1L), least(lit(nBuckets.toLong), col("mx") - col("mn") + 1))
          .cast("int").as("nb"))
    val b = obs.crossJoin(broadcast(mm))
      .withColumn("__bucket",
        width_bucket(col("__ord"), col("mn"), col("mx") + 1, col("nb")))
      .drop("mn", "mx", "nb")
    // raw-column ordering, same reason as [[prefixSum]]: __ord is for
    // bucketing only; long-collided distinct values must not be peers
    val w = Window.partitionBy(col(groupCol), col("__bucket"))
      .orderBy(col(orderCol))
    val local = b.withColumn("__local", sum(col(valueCol)).over(w))
    val btot = b.groupBy(col(groupCol), col("__bucket"))
      .agg(sum(col(valueCol)).as("__btot"))
    val carry = btot.as("a")
      .join(btot.as("b"),
        col(s"b.$groupCol") === col(s"a.$groupCol") &&
          col("b.__bucket") < col("a.__bucket"))
      .groupBy(col(s"a.$groupCol").as(groupCol),
        col("a.__bucket").as("__bucket"))
      .agg(sum(col("b.__btot")).as("__carry"))
    local.join(broadcast(carry), Seq(groupCol, "__bucket"), "left")
      .withColumn(outCol, col("__local") + coalesce(col("__carry"), lit(0L)))
      .drop("__bucket", "__local", "__carry", "__ord")
  }

  /** Explicit `buckets` wins; otherwise the session's shuffle
    * parallelism — the same number every other wide stage runs at.
    */
  private def sessionBuckets(df: DataFrame, buckets: Int): Int =
    if (buckets > 0) buckets
    else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt

  /** Skew-safe equi-join: spread each hot key of `big` over `nSalts`
    * partitions by a random salt, replicate `small` across all salt
    * values, join on (key, salt). Output is identical to the plain
    * join (salt is dropped); only the shuffle distribution changes.
    * AQE's skew-join handles moderate skew automatically — this is
    * for the pathological keys AQE's split thresholds won't touch.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 nSalts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod((rand(42) * nSalts).cast("int"), lit(nSalts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
