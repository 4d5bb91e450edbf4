package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaCodecs
import graft.tools.IndependentCodecs

/** Cross-decoder differential for the codec trio the driver cannot
  * DuckDB-oracle (`mm_decode`, `mm_resize`, `dedup_image`): every
  * digest the JDK codec path reports is recomputed by the
  * from-scratch decoders in [[IndependentCodecs]] (raw Inflater +
  * PNG unfilter; direct RIFF walk). The two implementations share no
  * code, so agreement is an independent check, not a self-referential
  * pin. Seed/size grids mirror the query formulas in
  * [[graft.operators.Multimodal]] (id % 3 kind split, 16+id%32 ×
  * 8+id%16 images, 256+id%512 samples, 2+id%4 frames).
  */
class IndependentCodecSpec extends AnyFunSuite {

  private val ids = (0L to 120L) ++ Seq(1000L, 4999L, 12345L)

  test("PNG: from-scratch inflate+unfilter agrees with the JDK decode") {
    for (id <- ids) {
      val w = 16 + (id % 32).toInt
      val h = 8 + (id % 16).toInt
      val png = MediaCodecs.pngBytes(w, h, id)
      val (jw, jh, jdig) = MediaCodecs.decodePng(png)
      assert(IndependentCodecs.pngDims(png) == ((jw, jh)), s"id $id dims")
      assert(IndependentCodecs.pngPixelDigest(png) == jdig, s"id $id digest")
      assert((jw, jh) == ((w, h)))
    }
  }

  test("resize: thumbnail digest matches an independent resample + decode") {
    for (id <- ids) {
      val w = 16 + (id % 32).toInt
      val h = 8 + (id % 16).toInt
      val png = MediaCodecs.pngBytes(w, h, id)
      val (thumb, reported) = MediaCodecs.resizePng(png, 8, 8)
      // check 1: the re-encoded thumbnail bytes, decoded from scratch,
      // hash to the digest the operator reported
      assert(IndependentCodecs.pngPixelDigest(thumb) == reported, s"id $id")
      // check 2: nearest-neighbor resampling the INDEPENDENTLY decoded
      // source with the same integer formula reproduces the digest —
      // validates the resample arithmetic, not just the re-encode
      val src = IndependentCodecs.decodePng(png)
      val md = java.security.MessageDigest.getInstance("MD5")
      for (y <- 0 until 8; x <- 0 until 8) {
        val off = ((y * src.height / 8) * src.width + (x * src.width / 8)) * 3
        md.update(src.rgb(off)); md.update(src.rgb(off + 1)); md.update(src.rgb(off + 2))
      }
      val expected = md.digest().map("%02x".format(_)).mkString
      assert(expected == reported, s"id $id resample")
    }
  }

  test("dHash: independent decode yields bit-identical perceptual hashes") {
    for (id <- ids) {
      val w = 16 + (id % 32).toInt
      val h = 8 + (id % 16).toInt
      val png = MediaCodecs.pngBytes(w, h, id)
      val variants = Seq(
        png,
        MediaCodecs.reencodePng(png),
        MediaCodecs.resizePng(png, w * 2, h * 2)._1,
        MediaCodecs.perturbPng(png))
      for ((v, i) <- variants.zipWithIndex)
        assert(IndependentCodecs.pngDHash(v) == MediaCodecs.dHashPng(v),
          s"id $id variant $i")
    }
  }

  test("WAV: direct RIFF walk agrees with javax.sound decode") {
    for (id <- ids) {
      val wav = MediaCodecs.wavBytes(256 + (id % 512).toInt, id)
      assert(IndependentCodecs.decodeWav(wav) == MediaCodecs.decodeWav(wav),
        s"id $id")
    }
  }

  test("WAV fingerprint: from-scratch RIFF walk agrees on every dedup variant") {
    for (id <- ids) {
      val wav = MediaCodecs.wavBytes(256 + (id % 512).toInt, id)
      val variants = Seq(wav,
        MediaCodecs.reencodeWav(wav),
        MediaCodecs.gainWav(wav, 1, 2),
        MediaCodecs.dropoutWav(wav))
      for ((v, i) <- variants.zipWithIndex)
        assert(IndependentCodecs.wavFingerprint(v) == MediaCodecs.fpWav(v),
          s"id $id variant $i")
    }
  }

  test("GFV1: independent container walk agrees with the JDK frame decode") {
    for (id <- ids) {
      val video = MediaCodecs.videoBytes(
        8 + (id % 8).toInt, 4 + (id % 4).toInt, 2 + (id % 4).toInt, id)
      assert(IndependentCodecs.decodeVideo(video) == MediaCodecs.decodeVideo(video),
        s"id $id")
    }
  }
}
