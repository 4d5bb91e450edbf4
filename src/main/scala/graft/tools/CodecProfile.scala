package graft.tools

import graft.operators.MediaCodecs

/** Driver-side micro-profile of the per-payload codec costs — the
  * attribution tool behind the codec-quartet scale numbers: times
  * each leg (JDK decode, from-scratch decode, fingerprint, digest)
  * over N synthetic payloads in a tight single-threaded loop, so a
  * per-clip constant (SPI probing, stream setup, digest lookup) is
  * visible without Spark in the way. Usage: runMain
  * graft.tools.CodecProfile [n]
  */
object CodecProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    def time(tag: String)(body: Long => Unit): Unit = {
      // one warm pass for JIT, then the timed pass
      (0L until math.min(n, 2000L).toLong).foreach(body)
      val t0 = System.nanoTime()
      (0L until n.toLong).foreach(body)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[codec] $tag%-28s ${dt}%8.2f s  (${dt / n * 1e6}%8.1f us/payload)")
    }
    val wavs = (0L until 64L).map(i =>
      MediaCodecs.wavBytes(256 + (i % 512).toInt, i)).toArray
    val pngs = (0L until 64L).map(i =>
      MediaCodecs.pngBytes(16 + (i % 32).toInt, 8 + (i % 16).toInt, i)).toArray
    time("wav: JDK decodeWav")(i => MediaCodecs.decodeWav(wavs((i % 64).toInt)))
    time("wav: JDK fpWav")(i => MediaCodecs.fpWav(wavs((i % 64).toInt)))
    time("wav: independent decode")(i =>
      IndependentCodecs.decodeWav(wavs((i % 64).toInt)))
    time("wav: independent fp")(i =>
      IndependentCodecs.wavFingerprint(wavs((i % 64).toInt)))
    time("png: JDK decodePng")(i => MediaCodecs.decodePng(pngs((i % 64).toInt)))
    time("png: JDK dHashPng")(i => MediaCodecs.dHashPng(pngs((i % 64).toInt)))
    time("png: independent features")(i =>
      IndependentCodecs.pngFeatures(pngs((i % 64).toInt)))

    // the same legs under executor-like concurrency: if the scaled
    // per-payload cost is far above the single-thread cost, the JDK
    // path serializes on a shared lock (SPI registry, stream cache),
    // and the cluster number is contention, not codec work
    val threads = 32
    def timePar(tag: String)(body: Long => Unit): Unit = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() =>
          (0L until n.toLong).foreach(i => body(i + t * 131L)))
        th.start(); th
      }
      ts.foreach(_.join())
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[codec] $tag%-28s ${dt}%8.2f s  " +
        f"(${dt / n / threads * 1e6 * threads}%8.1f us/payload wall x$threads)")
    }
    timePar("wav: JDK decodeWav x32")(i => MediaCodecs.decodeWav(wavs((i % 64).toInt)))
    timePar("wav: JDK fpWav x32")(i => MediaCodecs.fpWav(wavs((i % 64).toInt)))
    timePar("png: JDK decodePng x32")(i => MediaCodecs.decodePng(pngs((i % 64).toInt)))
    // the resize row is decode + NN resample + RE-ENCODE + decode:
    // the encode leg is the one the other rows never exercise, and
    // the mm_resize 100× swings (9-120 s run-to-run) point at it
    time("png: JDK resizePng")(i =>
      MediaCodecs.resizePng(pngs((i % 64).toInt), 8, 8))
    timePar("png: JDK resizePng x32")(i =>
      MediaCodecs.resizePng(pngs((i % 64).toInt), 8, 8))
    timePar("png: JDK encode x32")(i =>
      MediaCodecs.pngBytes(16 + (i % 32).toInt, 8 + (i % 16).toInt, i))
  }
}
