package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PlanFingerprint

/** Plan-shape regression net across the WHOLE query surface: every
  * registered query's normalized physical-plan fingerprint is diffed
  * against a checked-in golden, so pushdown, join strategy, exchange
  * reuse, TopK rewrite and window-partitioning contracts are locked
  * for all queries, not just the sampled ones in PlanContractSpec.
  *
  * After an INTENDED plan change, regenerate with
  *   REGEN_PLAN_GOLDENS=1 sbt "testOnly graft.PlanGoldenSpec"
  * and review the golden diff in git like any other code change.
  */
class PlanGoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"
  val goldenPath = Paths.get("src/test/resources/plan_fingerprints.txt")

  private def current(): Seq[(String, String)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> PlanFingerprint.of(fn(spark, sf))
    }

  private def parse(text: String): Map[String, String] =
    text.split("(?m)^==== ").filter(_.nonEmpty).map { block =>
      val (name, body) = block.span(_ != '\n')
      name.trim -> body.trim
    }.toMap

  test("physical plan fingerprints match the checked-in goldens") {
    val cur = current()
    if (sys.env.get("REGEN_PLAN_GOLDENS").contains("1")) {
      val text = cur.map { case (n, f) => s"==== $n\n$f" }.mkString("\n") + "\n"
      Files.createDirectories(goldenPath.getParent)
      Files.write(goldenPath, text.getBytes("UTF-8"))
      info(s"regenerated $goldenPath with ${cur.size} fingerprints")
    } else {
      assert(Files.exists(goldenPath),
        s"$goldenPath missing — regenerate with REGEN_PLAN_GOLDENS=1")
      val golden = parse(new String(Files.readAllBytes(goldenPath), "UTF-8"))
      val missing = cur.map(_._1).filterNot(golden.contains)
      val stale = golden.keys.filterNot(cur.map(_._1).toSet)
      val diffs = cur.flatMap { case (name, fp) =>
        golden.get(name).filter(_ != fp.trim).map { g =>
          val gl = g.linesIterator.toSeq
          val cl = fp.trim.linesIterator.toSeq
          val firstDiff = gl.zipAll(cl, "<end>", "<end>")
            .indexWhere { case (a, b) => a != b }
          s"$name (first diff at line $firstDiff):\n  golden: ${gl.lift(firstDiff).getOrElse("<end>")}\n  actual: ${cl.lift(firstDiff).getOrElse("<end>")}"
        }
      }
      assert(missing.isEmpty && stale.isEmpty && diffs.isEmpty,
        s"""plan fingerprints drifted from goldens.
           |new queries without goldens: $missing
           |goldens without queries: $stale
           |${diffs.mkString("\n")}
           |If the change is intended: REGEN_PLAN_GOLDENS=1 sbt "testOnly graft.PlanGoldenSpec"""".stripMargin)
    }
  }
}
