package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Dedup operator invariants beyond the DuckDB oracle. */
class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("blocked simhash pair search is output-identical to the all-pairs scan") {
    val brute = Dedup.simhashPairs(spark, sf)
    val blocked = Dedup.simhashPairsBlocked(spark, sf)
    assert(brute.except(blocked).isEmpty && blocked.except(brute).isEmpty)
  }

  test("occupancy-capped simhash pairs are a subset; no bucket binds at this SF") {
    val unc = Dedup.simhashPairsBlocked(spark, sf)
    val cap = Dedup.simhashPairsCapped(spark, sf)
    // capped can only DROP pairs (buckets removed, never added) …
    assert(cap.except(unc).isEmpty)
    // … and at sf0.001 no bucket exceeds the cap, so output is equal
    // (at sf0.1 the cap binds: 2.6x candidate cut for 37/312 pairs —
    // measured in SCALE.md; the oracle mirrors the cap there)
    assert(unc.except(cap).isEmpty)
    assert(cap.count() > 0)
  }

  test("minhash candidate pairs have high true Jaccard likelihood ordering") {
    import spark.implicits._
    // every doc produces a 16-slot signature, and signatures are stable
    val sig = Dedup.minhashSignature(spark, sf)
    assert(sig.count() == graft.sources.Tables.documents(spark, sf).count())
    val parts = sig.select($"minhash_sig").as[String].head()
    assert(parts.split(",").length == 16)
  }
}
