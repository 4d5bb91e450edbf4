package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the ScaleBench movement-gate prior parser: it must read
  * the per-query COUNT numbers (and only those — never the retime/
  * full/build maps that follow in the same JSON line) out of a real
  * committed sweep artifact, so a format drift in the sweep output
  * breaks here instead of silently disabling the gate.
  */
class ScaleBenchPriorSpec extends AnyFunSuite {

  test("parses the committed r14 sweep artifact") {
    val text = scala.io.Source.fromFile("tools/scale_sweep_r14.json").mkString
    val m = ScaleBench.parsePriorCounts(text)
    assert(m.size >= 160, s"expected the full registry, got ${m.size}")
    assert(m.contains("graph_pagerank") && m("graph_pagerank") > 0)
    // timeouts are recorded as -2 and must parse (the gate's c/p
    // ratio guards against them via the >= floor check)
    assert(m.get("dedup_minhash_recall").contains(-2.0))
  }

  test("scopes to the queries object, ignoring later maps") {
    val line = """{"metric":"total","value":9.0,"queries":{"a":1.5,"b":-2.0},""" +
      """"queries_full":{"a":99.0},"queries_retime":{"a":42.0}}"""
    assert(ScaleBench.parsePriorCounts(line) === Map("a" -> 1.5, "b" -> -2.0))
  }

  test("missing or malformed input yields an empty prior, not a crash") {
    assert(ScaleBench.parsePriorCounts("").isEmpty)
    assert(ScaleBench.parsePriorCounts("""{"no_queries_here":1}""").isEmpty)
  }
}
