package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Pins for the persisted dedup-graph state (`dedup_keep_best_idx`)
  * and the incremental component merge (`dedup_components_inc`).
  *
  * The planted corpus exercises every merge case the incremental
  * contraction must get right:
  *  - a NEW doc bridging two previously-SEPARATE old components
  *    (labels re-point through the merged super-node graph);
  *  - a NEW doc joining old docs that had no old pairs at all
  *    (pairless old vertices enter as singleton super-nodes);
  *  - an old component UNTOUCHED by the delta (label passes through
  *    unchanged, no recompute);
  *  - a NEW–NEW-only component (emitted purely from the delta);
  *  - a NEW doc with no near-dups (absent from output, as in the
  *    full recompute).
  *
  * Geometry note: 1 − J is a metric, so a bridge doc with legs at
  * J ≥ 0.8 to two docs forces those docs' J ≥ 0.6 — the planted
  * legs sit at J ≈ 0.88 (the triangle bound caps legs at ~0.9 when
  * the far pair must stay under 0.8), with the far pair at ≈ 0.75.
  */
class DedupGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  // 200 distinct words per base; block rewrites of 12 words give
  // gram-set Jaccard ≈ (198-14)/(198+14) ≈ 0.877 per leg and
  // ≈ (198-28)/(198+28) ≈ 0.752 for the two-block pair
  // letter-only words: the tokenizer splits on non-LETTERS, so a
  // digit suffix would collapse every word to its tag
  private def suffix(i: Int): String =
    "" + ('a' + i / 26).toChar + ('a' + i % 26).toChar
  private def words(tag: String) = (0 until 200).map(i => tag + suffix(i))
  private def block(tag: String, n: Int) = (0 until n).map(i => tag + suffix(i))
  private def rewrite(base: Seq[String], at: Int, repl: Seq[String]): Seq[String] =
    base.take(at) ++ repl ++ base.drop(at + repl.size)

  private lazy val docs = {
    val s = spark
    import s.implicits._
    val a = words("alpha"); val b = words("beta"); val c = words("gamma")
    val dd = words("delta")
    val x = block("xx", 12); val y = block("yy", 12)
    Seq(
      // group A: old 4 and 6 share NO old pair (J(4,6)≈0.75); new 3
      // bridges them -> component {3,4,6}, min label 3 (a NEW id wins)
      (3L, rewrite(a, 40, x).mkString(" ")),
      (4L, a.mkString(" ")),
      (6L, rewrite(rewrite(a, 40, x), 120, y).mkString(" ")),
      // group B: old components {8,10} (clones) and {14,16} (clones,
      // two blocks away); new 15 bridges -> {8,10,14,15,16}, min 8
      // (an OLD label wins; 14/16 re-point 14 -> 8)
      (8L, b.mkString(" ")),
      (10L, b.mkString(" ")),
      (14L, rewrite(rewrite(b, 40, x), 120, y).mkString(" ")),
      (16L, rewrite(rewrite(b, 40, x), 120, y).mkString(" ")),
      (15L, rewrite(b, 40, x).mkString(" ")),
      // group C: untouched old clone pair -> stays component 18
      (18L, c.mkString(" ")),
      (20L, c.mkString(" ")),
      // group D: new-new only clone pair -> component 21
      (21L, dd.mkString(" ")),
      (23L, dd.mkString(" ")),
      // a new doc with no near-dups anywhere
      (25L, (0 until 200).map(i => "lone" + suffix(i)).mkString(" "))
    ).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("planted cross-batch merge: incremental == full recompute == hand labels") {
    val path = java.nio.file.Files.createTempDirectory("dgraph_spec").toString
    val old = docs.filter(col("doc_id") % 2 === 0)
    Dedup.buildDedupGraphIndex(spark, old, path)
    val oldLabels = spark.read.parquet(s"$path/labels")
    val oldBands = spark.read.parquet(s"$path/bands")
    val oldGeom = spark.read.parquet(s"$path/geom")

    // the historical state itself: {8,10}, {14,16}, {18,20} and
    // nothing else (4 and 6 are below threshold, so pairless)
    assert(labelsOf(oldLabels) ==
      Map(8L -> 8L, 10L -> 8L, 14L -> 14L, 16L -> 14L, 18L -> 18L, 20L -> 18L))

    val inc = labelsOf(Dedup.componentsIncOf(
      docs, docs.filter(col("doc_id") % 2 === 1), oldLabels, oldBands,
      oldGeom))
    val expected = Map(
      3L -> 3L, 4L -> 3L, 6L -> 3L,
      8L -> 8L, 10L -> 8L, 14L -> 8L, 15L -> 8L, 16L -> 8L,
      18L -> 18L, 20L -> 18L,
      21L -> 21L, 23L -> 21L)
    assert(inc == expected, s"incremental $inc vs hand-computed $expected")
  }

  test("corpus: dedup_components_inc equals dedup_components row for row") {
    val full = Dedup.queries("dedup_components")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val inc = Dedup.queries("dedup_components_inc")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(full.nonEmpty && inc == full)
  }

  test("collapsed drop list equals the uncollapsed pair-level derivation") {
    val s = spark
    import s.implicits._
    val cand = Dedup.minhashPairs(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val sh = Dedup.shingles(spark, sf).as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pairs = cand.flatMap { case (a, b) =>
      val (sa, sb) = (sh(a), sh(b)); val c = (sa & sb).size
      val j = math.floor(c.toDouble / (sa.size + sb.size - c) * 1e4 + 0.5) / 1e4
      if (j >= 0.8) Some((a, b, j)) else None
    }
    val expect = pairs.groupBy(_._2).map { case (b, ps) =>
      (b, ps.map(_._1).min, ps.map(_._3).max) }.toSet
    val got = Dedup.queries("dedup_drop_list")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got == expect,
      s"\nonly-expect ${expect -- got}\nonly-got ${got -- expect}")
  }

  test("corpus: dedup_keep_best_idx equals dedup_keep_best row for row") {
    val live = Dedup.queries("dedup_keep_best")(spark, sf).collect().toSeq
    val idx = Dedup.queries("dedup_keep_best_idx")(spark, sf).collect().toSeq
    assert(live.nonEmpty && idx == live)
  }
}
