package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaDecoder

/** Multimodal plumbing: binary payload schema, batched decode seam,
  * agreement between the mapPartitions path and the SQL path.
  */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    val schema = m.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(m.count() > 0)
  }

  test("featurize (mapPartitions decode seam) agrees with the SQL feature path") {
    import spark.implicits._
    val viaDecoder = Multimodal
      .featurize(Multimodal.mediaTable(spark, sf), MediaDecoder.Deterministic)
      .select($"mediaId".as("media_id"), $"kind", $"nBytes".as("n_bytes"),
              $"width", $"height", $"digest")
    val viaSql = Multimodal.features(spark, sf)
    assert(viaDecoder.except(viaSql).isEmpty && viaSql.except(viaDecoder).isEmpty)
  }

  test("frame sampling emits only non-empty frames with stable digests") {
    import spark.implicits._
    val f = Multimodal.frames(spark, sf)
    assert(f.filter($"frame_len" <= 0).isEmpty)
    // every document yields at least frame 0 (all texts are non-empty)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(f.filter($"frame_idx" === 0).count() == nDocs)
  }

  test("the real decoder seam is present but stubbed") {
    intercept[NotImplementedError] {
      MediaDecoder.Real.decode(0L, "image", Array[Byte](1, 2, 3))
    }
  }
}
