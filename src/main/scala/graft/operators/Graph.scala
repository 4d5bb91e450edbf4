package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.functions.CrossEngine.pround

/** Link-graph centrality — the web-crawl quality signal a pretraining
  * pipeline weights domains by (OPIC / harmonic-centrality style crawl
  * prioritization runs exactly this shape over the host graph).
  *
  * The synthetic corpus has no hyperlinks, so the graph is the
  * part↔supplier bipartite co-occurrence graph from `lineitem`
  * (distinct (l_partkey, l_suppkey) pairs, doubled into a symmetric
  * directed edge list) — the same iterate-joins-to-fixpoint machinery
  * applies verbatim to a domain→domain link table.
  *
  * Determinism: PageRank's float mass sums are NOT order-free, so the
  * whole iteration runs in 10⁻¹² fixed-point BIGINT arithmetic —
  * contributions are `r div outdeg`, the damping blend is
  * `(85·Σ) div 100` — making every aggregate an order-free integer
  * sum: partition-count/engine/retry invariant bit for bit (the
  * integerize-before-aggregate discipline, see SCALE.md). All values
  * stay nonnegative, so Spark's truncate-toward-zero `div` and
  * DuckDB's flooring `//` agree (the negative-operand trap in
  * graft-session notes never arises). Headroom: Σ contrib ≤ 10¹²
  * (total mass), so the 85× blend peaks ≈ 8.5·10¹³ ≪ 2⁶³.
  *
  * Scale shape per iteration: one hash join of the rank vector with
  * the degree-annotated edge list (both keyed by src — AQE reuses the
  * edge exchange across iterations at runtime) and one partial-
  * aggregated groupBy(dst) that shrinks edge-stream rows back to node
  * cardinality before the wire; the node count folds in as a broadcast
  * scalar. Nothing corpus-sized is ever resident — at 100 TB (billions
  * of edges) each of the R=3 unrolled rounds is exactly one shuffle of
  * the edge stream, and a longer-horizon run would checkpoint the rank
  * vector every few rounds to cap the lazy plan tree (the
  * dedup_components 2^rounds lesson; at R=3 the tree is fine lazy).
  *
  * Every node of the doubled bipartite graph has outdeg ≥ 1 and
  * indeg ≥ 1 by construction, so there are no dangling-mass or
  * no-inbound corner cases and the per-round inner join is total.
  */
object Graph {

  /** 10⁻¹² fixed-point unit for the integer rank representation. */
  private val Unit = 1000000000000L

  private val Damp = 85 // ×1/100 — the classic 0.85 damping factor

  /** Symmetric directed edge list from distinct part–supplier pairs.
    * The doubling happens MAP-SIDE by exploding a 2-struct array after
    * ONE distinct (a UNION of two selects would re-evaluate the
    * distinct subtree per branch — the lazy-plan rule that bit twice).
    *
    * Nodes are DICTIONARY-ENCODED as longs the whole way through —
    * part p → 2p, supplier s → 2s+1 — and rendered to the public
    * 'p…'/'s…' strings only in the final projection: every shuffle,
    * join and aggregate of the iteration keys on a fixed-width BIGINT
    * instead of a string (measured 1.5× wall-clock on the 100×
    * ladder, and the 100 TB shuffle moves 8-byte keys, not text).
    */
  private def edgesOf(li: DataFrame): DataFrame =
    li.select((col("l_partkey") * 2).as("p"),
              (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
      .select(explode(array(
        struct(col("p").as("src"), col("s").as("dst")),
        struct(col("s").as("src"), col("p").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))

  /** Render the encoded node id back to the public string form. */
  private val RenderNode =
    "CASE WHEN node % 2 = 0 THEN concat('p', node div 2) " +
      "ELSE concat('s', node div 2) END"

  /** Top-20 nodes by 3-round damped PageRank over the part↔supplier
    * graph; `rank_fixed` is the exact 10⁻¹² fixed-point BIGINT the
    * iteration runs in, `rank` its human-readable double rendering.
    *
    * REGISTERED form (round 14): [[edgeCache]] materializes the edge
    * list ONCE per (JVM, corpus dir, fingerprint), PARTITIONED BY
    * DST, plus the degree-annotated init rank vector — and serving
    * runs the shuffle-free [[pagerankBroadcastCore]]. Round 13's
    * persist-cached SMJ form still paid shuffle+sort(|E|) per round
    * plus a contribution exchange (the calm-day probe read one round
    * at 76 s over 118M edges, warm serve 85 s); dst-clustering the
    * cache and broadcasting the node-cardinality rank vector removes
    * every per-round exchange. The result is bit-identical (the
    * whole iteration is fixed-point BIGINT arithmetic), so the
    * DuckDB oracle gate is unaffected; the lazy SMJ form stays
    * reachable via [[pagerankOf]] for explicit-frame specs and the
    * billion-node regime.
    */
  def pagerank(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val fp = lineitemFingerprint(d)
    val entry = edgeCache.compute(d, (_, prev) => prev match {
      case e @ (`fp`, _, _) => e
      case other =>
        // dir's parquet was rewritten in this JVM (ScaleBench-style
        // regeneration): drop the stale blocks, rebuild from the
        // new data — never serve stale cached edges
        if (other != null) {
          other._2.unpersist(blocking = false)
          other._3.unpersist(blocking = false)
        }
        val (edges, init) = edgesAndInitOf(li, persist = true)
        (fp, edges, init)
    })
    pagerankBroadcastCore(entry._2, entry._3, rounds = 3, topK = 20)
  }

  /** The two artifacts the broadcast serving plan runs on:
    *
    *  - edges partitioned by DST — the plan's one load-bearing
    *    property: every round's contribution aggregate groups by
    *    dst, so a dst-clustered cache makes it exchange-free
    *    (REPARTITION_BY_NUM origin, so AQE never coalesces it out
    *    from under the partitioning contract);
    *  - the init rank vector, derived from those edges rather than
    *    lineitem: on the SYMMETRIC doubled graph outdeg(v) =
    *    indeg(v), so degrees fall out of a partition-local
    *    groupBy(dst) over the cached edges, and N = |deg rows|
    *    replaces the countDistinct lineitem scan entirely.
    *
    * With `persist`, both are lazily cached — zero jobs at plan
    * build (the PlanContractSpec contract); the first action fills
    * both caches.
    */
  private def edgesAndInitOf(li: DataFrame,
                             persist: Boolean): (DataFrame, DataFrame) = {
    val parts = li.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val edges0 = edgesOf(li).repartition(parts, col("dst"))
    val edges =
      if (persist) edges0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else edges0
    val deg = edges.groupBy(col("dst"))
      .agg(count(lit(1)).as("outdeg"))
      .select(col("dst").as("node"), col("outdeg"))
    val n = deg.agg(count(lit(1)).as("n"))
    val init0 = deg.crossJoin(broadcast(n))
      .select(col("node"), expr(s"$Unit div n").as("r"), col("outdeg"),
        expr(s"(($Unit div n) * ${100 - Damp}) div 100").as("base"))
    val init =
      if (persist) init0.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else init0
    (edges, init)
  }

  /** The broadcast serving plan over an explicit lineitem-shaped
    * frame, uncached (spec entry — pinned bit-equal to the lazy SMJ
    * [[pagerankOf]] form).
    */
  private[graft] def pagerankBroadcastOf(li: DataFrame, rounds: Int,
                                         topK: Int): DataFrame = {
    val (edges, init) = edgesAndInitOf(li, persist = false)
    pagerankBroadcastCore(edges, init, rounds, topK)
  }

  /** The broadcast serving iteration (round 14): each round maps
    * the rank vector to per-source contributions (`r div outdeg`,
    * node-cardinality rows), BROADCASTS it, and hash-joins the
    * cached dst-partitioned edge list against it — the stream side
    * is never exchanged or sorted, against the SMJ form's
    * shuffle+sort(|E|) per round (the calm-day 100× probe read 76 s
    * for ONE such round over 118M edges). The contribution
    * aggregate still plans an Exchange (an AQE-compiled cached plan
    * reports UnknownPartitioning, so EnsureRequirements cannot
    * elide it — verified, including under
    * `canChangeCachedPlanOutputPartitioning`), but dst-clustering
    * makes it nearly free anyway: each cache partition holds ONLY
    * its own dst subset, so the partial aggregate is perfect (zero
    * cross-partition key duplication) and the exchange moves
    * node-cardinality rows (~2.1M), not the 118M edge stream.
    *
    * Regime: the broadcast is O(|nodes|) — ~2.1M rows at the 100×
    * rung, fine to ~10⁷ nodes (hundreds of MB). On a billion-node
    * link graph a deployment serves [[pagerankCore]] over a
    * src-co-partitioned cache instead (reachable via [[pagerankOf]];
    * same fixed-point arithmetic, bit-identical output —
    * GraphPagerankSpec pins the two cores equal on random graphs).
    * The arithmetic is the identical order-free BIGINT chain, so the
    * DuckDB oracle is unaffected.
    */
  private[graft] def pagerankBroadcastCore(edges: DataFrame, init: DataFrame,
                                           rounds: Int, topK: Int): DataFrame = {
    val fin = (1 to rounds).foldLeft(init) { (rk, _) =>
      edges.join(broadcast(rk.select(col("node").as("src"),
          expr("r div outdeg").as("c"), col("base"))), "src")
        .select(col("dst"), col("c"), col("base"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("sc"), count(lit(1)).as("outdeg"),
          min(col("base")).as("base"))
        .select(col("dst").as("node"),
          expr(s"base + ($Damp * sc) div 100").as("r"),
          col("outdeg"), col("base"))
    }
    fin
      .select(expr(RenderNode).as("node"), col("r").as("rank_fixed"),
        pround(col("r").cast("double") / Unit, 8).as("rank"))
      .orderBy(col("rank_fixed").desc, col("node"))
      .limit(topK)
  }

  /** Cheap driver-side content fingerprint of a dir's lineitem
    * parquet: per-file (name, length, mtime) digest. Any rewrite —
    * regeneration, compaction, an added part file — changes it, so
    * [[edgeCache]] can detect staleness without reading data.
    */
  private def lineitemFingerprint(d: String): String = {
    val root = new java.io.File(s"$d/lineitem.parquet")
    val files =
      if (root.isDirectory) root.listFiles().filter(_.isFile) else Array(root)
    files.sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|").hashCode.toString
  }

  /** Explicit invalidation hook: unpersist and forget every cached
    * edge list (e.g. between benchmark corpora, or if a caller
    * rewrote data outside the mtime resolution window).
    */
  def invalidateEdgeCache(): Unit = {
    edgeCache.values().forEach { case (_, edges, init) =>
      edges.unpersist(blocking = false)
      init.unpersist(blocking = false)
    }
    edgeCache.clear()
  }

  /** Cached edge list per (JVM, corpus dir, data fingerprint) — the
    * buildBackedQueries convention (the IVF-PQ index / frozen
    * classifier precedent), staleness-guarded by
    * [[lineitemFingerprint]] so an in-JVM rewrite of the dir's
    * parquet rebuilds instead of silently serving old edges.
    * `persist`, NOT `localCheckpoint`: SQL caching stores COLUMNAR
    * COMPRESSED batches (~16 B/edge → hundreds of MB at the 100×
    * rung's ~10⁸ edges), where localCheckpoint materializes
    * deserialized row objects — measured as a GC collapse (the first
    * call blew the 240 s sweep budget; the persist build is tens of
    * seconds). persist is also lazy (zero jobs at plan build, so the
    * PlanContractSpec lazy-build gate holds on EVERY call — the
    * cache fills inside the first action, which the bench's
    * build/steady split accounts for) and recompute-safe: lineage is
    * kept, so an evicted or cancel-poisoned block transparently
    * rebuilds instead of failing the query. Edge cardinality only
    * (distinct pairs ×2) — never the corpus.
    */
  private val edgeCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, DataFrame, DataFrame)]()

  /** [[pagerank]] over an explicit lineitem-shaped frame (spec entry).
    *
    * Plan-tree discipline (the dedup_components lesson, applied to a
    * static side table): the rank rows CARRY `outdeg` and the damping
    * base term, so each round references the edge list exactly ONCE —
    * no per-round degree join, no per-round node-count broadcast. The
    * symmetric graph makes this sound: every out-edge (v, u) mirrors
    * an in-edge (u, v), so outdeg(v) = indeg(v) = `count(*)` of the
    * very groupBy(dst = v) that sums v's incoming contributions, and
    * the constant base rides along as `min(base)`. The node-count
    * scalar likewise skips the pair distinct entirely: in the
    * bipartite doubling, N = |distinct parts| + |distinct suppliers|,
    * one partial-aggregated lineitem scan. The first-cut form
    * (degree-annotated edges + per-round scalar cross join) embedded
    * the lineitem-distinct subtree 11× and measured 10.5 s at sf0.1;
    * this one embeds it 4× (3 rounds + init degrees).
    *
    * `checkpoint = true` (the [[Similarity.trainPqCodebooks]]
    * convention) materializes the edge list once with
    * `localCheckpoint()` so each round reuses it instead of
    * re-deriving from lineitem — what a long-horizon run on a real
    * link graph would do, and since round 13 the REGISTERED form
    * (the lazy 4×-embedded tree was the worst non-output-bound
    * production ratio on the 100× ladder). `false` keeps the plan
    * build job-free for spec paths that only inspect the tree.
    */
  private[graft] def pagerankOf(li: DataFrame, rounds: Int, topK: Int,
                                checkpoint: Boolean = false): DataFrame =
    pagerankCore(
      if (checkpoint) edgesOf(li).localCheckpoint() else edgesOf(li),
      li, rounds, topK)

  /** The iteration itself, over an explicit (src, dst) edge frame —
    * checkpointed or lazy, the arithmetic is identical.
    */
  private def pagerankCore(edges: DataFrame, li: DataFrame,
                           rounds: Int, topK: Int): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val n = li.agg((countDistinct(col("l_partkey")) +
      countDistinct(col("l_suppkey"))).as("n"))
    val init = deg.crossJoin(broadcast(n))
      .select(col("src").as("node"), expr(s"$Unit div n").as("r"),
        col("outdeg"),
        expr(s"(($Unit div n) * ${100 - Damp}) div 100").as("base"))
    val fin = (1 to rounds).foldLeft(init) { (rk, _) =>
      edges.join(rk.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("r div outdeg").as("c"), col("base"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("sc"), count(lit(1)).as("outdeg"),
          min(col("base")).as("base"))
        .select(col("dst").as("node"),
          expr(s"base + ($Damp * sc) div 100").as("r"),
          col("outdeg"), col("base"))
    }
    fin
      .select(expr(RenderNode).as("node"), col("r").as("rank_fixed"),
        pround(col("r").cast("double") / Unit, 8).as("rank"))
      .orderBy(col("rank_fixed").desc, col("node"))
      .limit(topK)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> pagerank _,
  )

  /** One damping-blend round of the oracle, as a pair of CTEs. */
  private def roundCte(i: Int): String =
    s"""s$i AS (SELECT e.dst AS node, CAST(sum(r.r // d.outdeg) AS BIGINT) AS sc
       |        FROM edges e JOIN deg d ON e.src = d.src
       |        JOIN r${i - 1} r ON r.node = e.src GROUP BY e.dst),
       |r$i AS (SELECT node,
       |          (($Unit // n) * ${100 - Damp}) // 100 + ($Damp * sc) // 100 AS r
       |        FROM s$i CROSS JOIN n)""".stripMargin

  val oracles: Map[String, String] = Map(
    "graph_pagerank" ->
      s"""WITH pairs AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s
         |               FROM lineitem),
         |edges AS (
         |  SELECT 'p' || p AS src, 's' || s AS dst FROM pairs
         |  UNION ALL
         |  SELECT 's' || s AS src, 'p' || p AS dst FROM pairs),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |n AS (SELECT count(DISTINCT l_partkey) + count(DISTINCT l_suppkey)
         |        AS n FROM lineitem),
         |r0 AS (SELECT src AS node, $Unit // n AS r FROM deg CROSS JOIN n),
         |${roundCte(1)},
         |${roundCte(2)},
         |${roundCte(3)}
         |SELECT node, r AS rank_fixed,
         |  pround(CAST(r AS DOUBLE) / $Unit, 8) AS rank
         |FROM r3 ORDER BY rank_fixed DESC, node LIMIT 20""".stripMargin,
  )
}
