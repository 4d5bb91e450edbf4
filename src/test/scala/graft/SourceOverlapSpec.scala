package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Pins for the round-13 bounded source-overlap twin
  * (`dedup_source_overlap_capped`): equal to the full matrix where
  * the occupancy cap doesn't bind (every gate SF), and
  * rank-preserving on a corpus where it does — the audit question
  * the matrix answers is "which source pairs overlap MOST", so the
  * twin must keep that ordering while dropping the quadratic
  * hot-bucket mass.
  */
class SourceOverlapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("capped matrix equals the full one on the gate corpus (cap unbound)") {
    val full = SparkEntry.queries("dedup_source_overlap")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val capped = SparkEntry.queries("dedup_source_overlap_capped")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(capped.nonEmpty)
    assert(capped === full)
  }

  test("where the cap binds, cross-source overlap ranking is preserved") {
    val s = spark
    import s.implicits._
    // Three sources; per cross-source pair a mix of SMALL clone
    // clusters (4 docs, under the cap — the typical near-dup mass)
    // whose count encodes the true overlap ranking AB > AC > BC, plus
    // one HUGE cluster (20 docs, over the cap — the template-farm
    // mass that makes the uncapped matrix quadratic). Identical texts
    // share every band signature; distinct texts share none.
    var id = 0L
    val rows = Seq.newBuilder[(Long, String, String)]
    // fully distinct token sets per cluster — zero Jaccard across
    // clusters, so no cross-cluster band collisions muddy the counts.
    // LETTER-ONLY words: the tokenizer splits on non-letters, so a
    // digit-bearing word would collapse to its letter prefix and
    // silently merge clusters into one hot bucket.
    def cluster(k: String, n: Int, sa: String, sb: String): Unit =
      (0 until n).foreach { i =>
        rows += ((id, ('a' to 'f').map(j => s"${k}w$j").mkString(" "),
          if (i % 2 == 0) sa else sb))
        id += 1
      }
    ('a' to 'j').foreach(i => cluster(s"ab$i", 4, "A", "B"))
    ('a' to 'f').foreach(i => cluster(s"ac$i", 4, "A", "C"))
    ('a' to 'b').foreach(i => cluster(s"bc$i", 4, "B", "C"))
    cluster("abHuge", 20, "A", "B")
    cluster("acHuge", 20, "A", "C")
    cluster("bcHuge", 20, "B", "C")
    val docs = rows.result().toDF("doc_id", "text", "source")

    def cell(m: Map[(String, String), Long], a: String, b: String): Long =
      m.getOrElse((a, b), 0L)
    def matrixOf(cap: Long): Map[(String, String), Long] =
      Dedup.sourceOverlapCappedOf(docs, cap).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val full = matrixOf(Long.MaxValue)
    val capped = matrixOf(8L)
    // the cap actually bound: the huge clusters' pairs are gone
    assert(cell(capped, "A", "B") < cell(full, "A", "B"))
    // ranking preserved in both views, with the same strict order
    for (m <- Seq(full, capped)) {
      assert(cell(m, "A", "B") > cell(m, "A", "C"))
      assert(cell(m, "A", "C") > cell(m, "B", "C"))
    }
    // and the surviving mass is exactly the small-cluster pair count
    // (10/6/2 clusters x 4 cross pairs each): nothing else was lost
    assert(cell(capped, "A", "B") == 40L)
    assert(cell(capped, "A", "C") == 24L)
    assert(cell(capped, "B", "C") == 8L)
  }
}
