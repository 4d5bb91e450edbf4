package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MediaCodecs, Multimodal}
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

  test("real PNG codec: encode compresses, decode recovers exact pixels") {
    import graft.operators.MediaCodecs
    val png = MediaCodecs.pngBytes(20, 10, seed = 42L)
    // real PNG: magic bytes present, deflate applied
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val f = MediaDecoder.Real.decode(7L, "image", png)
    assert(f.width == 20 && f.height == 10 && f.nBytes == png.length)
    // decode is deterministic and reads actual pixel content
    assert(f.digest == MediaDecoder.Real.decode(7L, "image",
      MediaCodecs.pngBytes(20, 10, seed = 42L)).digest)
    assert(f.digest != MediaDecoder.Real.decode(7L, "image",
      MediaCodecs.pngBytes(20, 10, seed = 43L)).digest)
  }

  test("real WAV codec: RIFF header + PCM round trip") {
    import graft.operators.MediaCodecs
    val wav = MediaCodecs.wavBytes(300, seed = 42L)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    val f = MediaDecoder.Real.decode(8L, "audio", wav)
    assert(f.width == 300, "decoded sample count")
    assert(f.height == 8000, "decoded sample rate")
  }

  test("mm_decode runs the real codecs end-to-end in the cluster path") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val out = Multimodal.decodeRoundTrip(spark, sf)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(out.count() == nDocs)
    // all three kinds present, decoded dimensions equal the
    // generation parameters per row
    assert(out.select("kind").distinct().count() == 3)
    val bad = out.filter(
      ($"kind" === "image" &&
        ($"n_frames" =!= 1 ||
         $"width" =!= lit(16) + $"media_id" % 32 ||
         $"height" =!= lit(8) + $"media_id" % 16)) ||
      ($"kind" === "audio" &&
        ($"n_frames" =!= 1 ||
         $"width" =!= lit(256) + $"media_id" % 512 || $"height" =!= 8000)) ||
      ($"kind" === "video" &&
        ($"n_frames" =!= lit(2) + $"media_id" % 4 ||
         $"width" =!= lit(8) + $"media_id" % 8 ||
         $"height" =!= lit(4) + $"media_id" % 4)))
    assert(bad.isEmpty, "decoded features must match generation parameters")
  }

  test("real video codec: GFV1 container round trip through real PNG frames") {
    import graft.operators.MediaCodecs
    val video = MediaCodecs.videoBytes(12, 6, 3, seed = 42L)
    assert(new String(video.take(4), "US-ASCII") == "GFV1")
    val f = MediaDecoder.Real.decode(9L, "video", video)
    assert(f.frames == 3 && f.width == 12 && f.height == 6
      && f.nBytes == video.length)
    // deterministic, and sensitive to any frame's pixel content
    assert(f.digest == MediaDecoder.Real.decode(9L, "video",
      MediaCodecs.videoBytes(12, 6, 3, seed = 42L)).digest)
    assert(f.digest != MediaDecoder.Real.decode(9L, "video",
      MediaCodecs.videoBytes(12, 6, 3, seed = 43L)).digest)
    // exact value: the container digest is md5 over the per-frame
    // pixel digests, recomputed here independently frame by frame
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(video.drop(8)))
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 3).foreach { _ =>
      val frame = new Array[Byte](in.readInt())
      in.readFully(frame)
      md.update(MediaCodecs.decodePng(frame)._3.getBytes("US-ASCII"))
    }
    assert(f.digest == md.digest().map("%02x".format(_)).mkString)
  }

  test("real resize: nearest-neighbor thumbnail round trip, digest pinned") {
    import graft.operators.MediaCodecs
    val png = MediaCodecs.pngBytes(20, 10, seed = 42L)
    val (thumb, digest) = MediaCodecs.resizePng(png, 8, 8)
    // thumbnail is a real PNG with the target dimensions
    val (tw, th, decodedDigest) = MediaCodecs.decodePng(thumb)
    assert(tw == 8 && th == 8 && decodedDigest == digest)
    // exact pixel pin: re-sample the decoded SOURCE with the same
    // integer formula and digest — must equal the codec round trip
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val md = java.security.MessageDigest.getInstance("MD5")
    for (y <- 0 until 8; x <- 0 until 8) {
      val p = src.getRGB(x * 20 / 8, y * 10 / 8) & 0xFFFFFF
      md.update((p >> 16).toByte); md.update((p >> 8).toByte); md.update(p.toByte)
    }
    assert(digest == md.digest().map("%02x".format(_)).mkString)
    // deterministic across encodes
    assert(digest == MediaCodecs.resizePng(
      MediaCodecs.pngBytes(20, 10, seed = 42L), 8, 8)._2)
  }

  test("mm_resize emits one thumbnail row per document with pinned dims") {
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val out = Multimodal.resizeThumbnails(spark, sf)
    assert(out.count() == graft.sources.Tables.documents(spark, sf).count())
    val bad = out.filter(
      $"thumb_w" =!= 8 || $"thumb_h" =!= 8 || $"thumb_bytes" <= 0 ||
      $"src_w" =!= lit(16) + $"media_id" % 32 ||
      $"src_h" =!= lit(8) + $"media_id" % 16)
    assert(bad.isEmpty)
  }

  test("unknown media kind fails loudly, not silently") {
    intercept[IllegalArgumentException] {
      MediaDecoder.Real.decode(0L, "hologram", Array[Byte](1, 2, 3))
    }
  }

  test("dHash invariances: re-encode and NN-rescale exact, edit within 1 bit") {
    import graft.operators.MediaCodecs
    val png = MediaCodecs.pngBytes(24, 12, seed = 7L)
    val h0 = MediaCodecs.dHashPng(png)
    assert(MediaCodecs.dHashPng(MediaCodecs.reencodePng(png)) == h0)
    assert(MediaCodecs.dHashPng(MediaCodecs.resizePng(png, 48, 24)._1) == h0)
    val hEdit = MediaCodecs.dHashPng(MediaCodecs.perturbPng(png))
    assert(java.lang.Long.bitCount(h0 ^ hEdit) <= 1)
    // unrelated images differ widely
    val hOther = MediaCodecs.dHashPng(MediaCodecs.pngBytes(24, 12, seed = 8L))
    assert(java.lang.Long.bitCount(h0 ^ hOther) > 10)
  }

  test("dedup_image finds exactly the planted duplicate groups") {
    import spark.implicits._
    val ids = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    // per decade, ids with residue 0-4 are copies of the decade base
    val expected = ids.groupBy(id => id - id % 10).values.flatMap { g =>
      val copies = g.filter(id => id % 10 <= 4).toSeq.sorted
      for (a <- copies; b <- copies if a < b) yield (a, b)
    }.toSet
    val got = Multimodal.imageDedup(spark, sf)
      .select("media_a", "media_b", "hamming")
      .as[(Long, Long, Long)].collect()
    assert(got.map(p => (p._1, p._2)).toSet == expected)
    assert(got.forall(_._3 <= 2), "planted copies must be within 2 bits")
    assert(expected.nonEmpty)
  }

  test("dedup_image plans the blocked equi-join, not an all-pairs scan") {
    val plan = Multimodal.imageDedup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"), plan)
  }

  test("fpWav invariances: re-encode exact, gain exact-enough, edit local") {
    val wav = MediaCodecs.wavBytes(300, seed = 7L)
    val h0 = MediaCodecs.fpWav(wav)
    assert(MediaCodecs.fpWav(MediaCodecs.reencodeWav(wav)) == h0)
    // half-gain: every window energy scales ~×¼; comparisons survive
    // (truncation noise is far below typical window-energy gaps)
    val hGain = MediaCodecs.fpWav(MediaCodecs.gainWav(wav, 1, 2))
    assert(java.lang.Long.bitCount(h0 ^ hGain) <= 1,
      s"gain flipped ${java.lang.Long.bitCount(h0 ^ hGain)} bits")
    // a one-window dropout can only move the two comparisons that
    // border the zeroed window
    val hEdit = MediaCodecs.fpWav(MediaCodecs.dropoutWav(wav))
    assert(java.lang.Long.bitCount(h0 ^ hEdit) <= 2)
    val hOther = MediaCodecs.fpWav(MediaCodecs.wavBytes(300, seed = 8L))
    assert(java.lang.Long.bitCount(h0 ^ hOther) > 10)
  }

  test("dedup_audio finds exactly the planted duplicate groups") {
    import spark.implicits._
    val ids = graft.sources.Tables.documents(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val expected = ids.groupBy(id => id - id % 10).values.flatMap { g =>
      val copies = g.filter(id => id % 10 <= 4).toSeq.sorted
      for (a <- copies; b <- copies if a < b) yield (a, b)
    }.toSet
    val got = Multimodal.audioDedup(spark, sf)
      .select("media_a", "media_b", "hamming")
      .as[(Long, Long, Long)].collect()
    assert(got.map(p => (p._1, p._2)).toSet == expected)
    assert(got.forall(_._3 <= 3), "planted copies must be within 3 bits")
    assert(expected.nonEmpty)
  }

  test("dedup_audio plans the blocked equi-join, not an all-pairs scan") {
    val plan = Multimodal.audioDedup(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"), plan)
  }

  // --- in-plan cross-decoder guards: the no_oracle codec rows carry
  // their own cross-implementation equality proof ------------------

  test("all four codec queries carry the cross-decoder raise_error guard in-plan") {
    for (q <- Seq("mm_decode", "mm_resize", "dedup_image", "dedup_audio")) {
      val plan = Multimodal.queries(q)(spark, sf)
        .queryExecution.analyzed.toString
      assert(plan.contains("raise_error"),
        s"$q must guard the JDK decode against the independent decode in-plan")
    }
  }

  test("cross-decoder guard fires on a tampered independent decode") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{lit, when}
    val media = Seq(
      (0L, "image", MediaCodecs.pngBytes(16, 8, 0L)),
      (1L, "audio", MediaCodecs.wavBytes(256, 1L)),
      (2L, "video", MediaCodecs.videoBytes(8, 4, 2, 2L)))
      .toDF("media_id", "kind", "payload")
    val both = Multimodal.decodedBoth(media)
    // untampered: both decoders agree on every row, guard passes
    assert(Multimodal.applyCrossGuard(both).count() == 3)
    // tamper ONE independent digest → the query itself must raise,
    // not emit the row
    val tampered = both.withColumn("i_digest",
      when($"media_id" === 1L, lit("deadbeef")).otherwise($"i_digest"))
    val e = intercept[Exception] {
      Multimodal.applyCrossGuard(tampered).collect()
    }
    assert(e.getMessage.contains("cross-decoder mismatch"),
      s"guard must name the mismatch: ${e.getMessage}")
  }

  test("corrupted payload cannot slip through the guarded decode") {
    import spark.implicits._
    // truncating the PNG mid-IDAT breaks BOTH decoders — the guarded
    // decode surfaces the failure instead of emitting a feature row
    val png = MediaCodecs.pngBytes(16, 8, 0L)
    val corrupt = png.take(png.length / 2)
    val media = Seq((0L, "image", corrupt)).toDF("media_id", "kind", "payload")
    intercept[Exception] {
      Multimodal.applyCrossGuard(Multimodal.decodedBoth(media)).collect()
    }
  }
}
