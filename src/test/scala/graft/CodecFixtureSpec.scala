package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pin for the round-13 persisted codec fixture: a corpus dir that
  * carries `mmfix_*.parquet` (the ScaleBench fixture step, so the
  * 100× codec rows measure decode-only) must yield BIT-IDENTICAL
  * query output to the synthesized map-side path — payload synthesis
  * is deterministic per id, and the fixture is just those bytes
  * stored.
  */
class CodecFixtureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("fixture-backed codec queries equal the synthesized path bit for bit") {
    val dir = java.nio.file.Files.createTempDirectory("mmfix").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(s"$dir/documents.parquet"),
      java.nio.file.Paths.get(s"$sf/documents.parquet"))
    graft.operators.Multimodal.writeCodecFixtures(spark, dir)
    for (q <- Seq("mm_decode", "mm_resize", "dedup_image", "dedup_audio")) {
      val synthesized = SparkEntry.queries(q)(spark, sf)
        .collect().map(_.toSeq).toSeq
      val fixtureBacked = SparkEntry.queries(q)(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(fixtureBacked.nonEmpty, s"$q fixture path returned nothing")
      assert(fixtureBacked === synthesized, s"$q fixture path diverged")
    }
  }
}
