package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Candidate-volume measurement for the blocked SimHash pair scan —
  * the number that decides whether the pigeonhole join survives
  * 100 TB. For each data dir it counts, from the same 64-bit
  * fingerprint table:
  *
  *  - `wide`:   candidates admitted by the shipped 4×16-bit blocking
  *              (per-block random collision 2⁻¹⁶), split into true
  *              matches (Hamming ≤ 3) and background;
  *  - `narrow`: candidates a 16×4-bit blocking of the same
  *              fingerprint would admit (per-block collision 2⁻⁴ —
  *              the shape of the pre-round-5 8×4-bit plan), counted
  *              only as volume;
  *  - `allpairs` = C(N,2) for reference.
  *
  * Background ≈ nBlocks·C(N,2)/2^blockBits for random signatures, so
  * wide background should sit ~4 orders of magnitude under narrow at
  * every scale point. Results are appended to SCALE.md by hand.
  *
  * Usage: runMain graft.SimhashScale [dir ...]
  * (env SIMHASH_SCALE_SKIP_NARROW=1 skips the narrow baseline — at
  * 250k docs it counts a ~10¹¹-row join whose verdict is already
  * known: ≈3.4× all-pairs at every measured point.)
  */
object SimhashScale {

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
               "target/scaled_5x", "target/scaled_10x")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (d <- dirs) {
      val sig = Dedup.simhash(spark, d).select(col("doc_id"), col("simhash"))
        .cache()
      val n = sig.count()

      def candidates(nBlocks: Int, blockBits: Int): (Long, Long) = {
        val mask = (1L << blockBits) - 1
        val blocked = sig.select(col("doc_id"), col("simhash"),
          explode(array((0 until nBlocks).map { b =>
            struct(lit(b).as("blk"),
                   expr(s"(simhash >> ${blockBits * b}) & $mask").as("bv"))
          }: _*)).as("bb"))
          .select(col("doc_id"), col("simhash"),
                  col("bb.blk").as("blk"), col("bb.bv").as("bv"))
        val a = blocked.select(col("doc_id").as("doc_a"),
                               col("simhash").as("sh_a"), col("blk"), col("bv"))
        val c = blocked.select(col("doc_id").as("doc_b"),
                               col("simhash").as("sh_b"), col("blk"), col("bv"))
        val cand = a.join(c, Seq("blk", "bv")).filter(col("doc_a") < col("doc_b"))
        val agg = cand.agg(
          count(lit(1)).as("total"),
          count(when(expr("bit_count(sh_a ^ sh_b) <= 3"), 1)).as("matching"))
          .head()
        (agg.getLong(0), agg.getLong(1))
      }

      val (wideTotal, wideMatch) = candidates(4, 16)
      val narrowTotal =
        if (sys.env.contains("SIMHASH_SCALE_SKIP_NARROW")) -1L
        else candidates(16, 4)._1
      val allPairs = n * (n - 1) / 2

      // occupancy-capped volume (the dedup_simhash_capped plan): drop
      // (blk, bv) buckets with more than `cap` members before pairing
      def cappedCandidates(cap: Int): (Long, Long) = {
        val blocked = sig.select(col("doc_id"), col("simhash"),
          explode(array((0 until 4).map { b =>
            struct(lit(b).as("blk"),
                   expr(s"(simhash >> ${16 * b}) & 65535").as("bv"))
          }: _*)).as("bb"))
          .select(col("doc_id"), col("simhash"),
                  col("bb.blk").as("blk"), col("bb.bv").as("bv"))
        val keep = blocked.groupBy(col("blk"), col("bv"))
          .agg(count(lit(1)).as("occ")).filter(col("occ") <= cap)
          .select(col("blk"), col("bv"))
        val kept = blocked.join(keep, Seq("blk", "bv"))
        val a = kept.select(col("doc_id").as("doc_a"),
                            col("simhash").as("sh_a"), col("blk"), col("bv"))
        val c = kept.select(col("doc_id").as("doc_b"),
                            col("simhash").as("sh_b"), col("blk"), col("bv"))
        val agg = a.join(c, Seq("blk", "bv")).filter(col("doc_a") < col("doc_b"))
          .agg(count(lit(1)).as("total"),
               count(when(expr("bit_count(sh_a ^ sh_b) <= 3"), 1)).as("matching"))
          .head()
        (agg.getLong(0), agg.getLong(1))
      }
      val (capTotal, capMatch) = cappedCandidates(50)

      println(f"""{"dir":"$d","n_docs":$n,"allpairs":$allPairs,""" +
        f""""wide_total":$wideTotal,"wide_matching":$wideMatch,""" +
        f""""wide_background":${wideTotal - wideMatch},""" +
        f""""capped50_total":$capTotal,"capped50_matching":$capMatch,""" +
        f""""narrow_total":$narrowTotal}""")
      sig.unpersist()
    }
    spark.stop()
  }
}
