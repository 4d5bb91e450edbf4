package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real media codecs from the JDK — no external libraries: PNG via
  * javax.imageio (actual deflate compression/decompression), WAV via
  * javax.sound.sampled (actual RIFF/PCM encode/parse). This is what
  * makes [[Multimodal.MediaDecoder.Real]] genuinely execute codec
  * work for image and audio payloads; video stays a stubbed seam
  * (the JDK ships no video codec).
  *
  * Encoders are deterministic (pixel/sample patterns derived from a
  * seed via a fixed LCG), so round-trip queries are reproducible.
  */
object MediaCodecs {

  /** JVM-WIDE codec defaults, applied at an explicit init point
    * ([[graft.GraftSession.builder]]) rather than as a class-load
    * side effect — any other ImageIO user in the process is affected,
    * so the mutation belongs where the process is configured.
    *
    * ImageIO defaults to DISK-backed stream caching: every read/write
    * spills the ImageInputStream/ImageOutputStream to a temp FILE, so
    * a KB-sized in-memory payload pays file create/write/delete per
    * decode — churn that dominates the actual deflate work at corpus
    * scale (the codec quartet decodes 10⁵-10⁶ tiny payloads per
    * query). Memory caching changes none of the codec work, just
    * where the stream buffers live. Process-wide, thread-safe,
    * idempotent.
    */
  def initJvmWideCodecDefaults(): Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** The PNG reader/writer providers resolved ONCE — the WAV SPI
    * lesson (below) applied to the image seam after the round-14
    * profile caught it red-handed: `ImageIO.read`/`ImageIO.write`
    * walk the IIORegistry on EVERY call (format probing for read,
    * format-name lookup for write), and under 32 executor threads
    * the registry serializes the walk — measured 137 → 730 µs per
    * decode and 211 → 3554 µs per resize (decode+encode) wall
    * against the single-thread cost, a 5-17× lock tax that made
    * mm_resize's 100× numbers swing 9-120 s run to run. The SPI
    * objects are stateless factories; each call still creates its
    * own reader/writer instance (those are NOT thread-safe), so the
    * codec work is unchanged — only the per-call registry walk goes.
    */
  private lazy val pngReaderSpi: javax.imageio.spi.ImageReaderSpi = {
    val it = ImageIO.getImageReadersByFormatName("png")
    require(it.hasNext, "no installed PNG ImageReader")
    it.next().getOriginatingProvider
  }

  private lazy val pngWriterSpi: javax.imageio.spi.ImageWriterSpi = {
    val it = ImageIO.getImageWritersByFormatName("png")
    require(it.hasNext, "no installed PNG ImageWriter")
    it.next().getOriginatingProvider
  }

  /** PNG decode through the cached provider — the same
    * `PNGImageReader` class `ImageIO.read` resolves, minus the
    * per-call registry walk; byte-identical output.
    */
  private def readPng(bytes: Array[Byte]): BufferedImage = {
    val reader = pngReaderSpi.createReaderInstance()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, true, true)
      reader.read(0)
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** PNG encode through the cached provider (same rationale);
    * default write params, byte-identical to `ImageIO.write`.
    */
  private def writePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val writer = pngWriterSpi.createWriterInstance()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(img)
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  private def lcg(seed: Long): Long = seed * 6364136223846793005L + 1442695040888963407L

  /** Deterministic RGB image, compressed to real PNG bytes. */
  def pngBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var v = lcg(seed)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        v = lcg(v + x * 9973L + y * 31L)
        img.setRGB(x, y, (v >>> 24).toInt & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    writePng(img)
  }

  /** Real PNG decode: (width, height, md5 of the decoded pixel ints). */
  def decodePng(bytes: Array[Byte]): (Int, Int, String) = {
    val img = readPng(bytes)
    val md = java.security.MessageDigest.getInstance("MD5")
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val p = img.getRGB(x, y) & 0xFFFFFF
        md.update((p >> 16).toByte); md.update((p >> 8).toByte); md.update(p.toByte)
        x += 1
      }
      y += 1
    }
    (img.getWidth, img.getHeight,
      md.digest().map("%02x".format(_)).mkString)
  }

  /** Real image resize: decode the PNG, nearest-neighbor-sample the
    * pixel grid to (tw, th), re-encode as PNG. Nearest neighbor
    * (src[x·sw/tw, y·sh/th]) is chosen over Graphics2D interpolation
    * because it is integer arithmetic — bit-deterministic on any JVM,
    * where bilinear float rounding is an implementation detail.
    * Returns the thumbnail bytes plus the md5 of its decoded pixels.
    */
  def resizePng(bytes: Array[Byte], tw: Int, th: Int): (Array[Byte], String) = {
    val src = readPng(bytes)
    val out = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < th) {
      var x = 0
      while (x < tw) {
        out.setRGB(x, y,
          src.getRGB(x * src.getWidth / tw, y * src.getHeight / th) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    val png = writePng(out)
    (png, decodePng(png)._3)
  }

  /** 64-bit perceptual difference hash (dHash) of a PNG: decode, take
    * a 9×8 nearest-neighbor luma sample grid, one bit per horizontally
    * adjacent comparison. All integer arithmetic (nearest-neighbor
    * sampling, 299/587/114 luma), so the hash is bit-deterministic on
    * any JVM. Key invariance, used by the planted-duplicate spec:
    * nearest-neighbor sampling at relative coordinates makes the hash
    * EXACTLY equal across nearest-neighbor rescales (floor(floor(k·x)/k)
    * = floor(x)), and re-encoding preserves pixels hence the hash;
    * small perturbations flip at most the few bits whose samples they
    * touch — which is what the Hamming-≤3 pairing tolerance absorbs.
    */
  def dHashPng(bytes: Array[Byte]): Long = {
    val img = readPng(bytes)
    val w = img.getWidth
    val h = img.getHeight
    def luma(i: Int, j: Int): Int = {
      val p = img.getRGB(i * w / 9, j * h / 8) & 0xFFFFFF
      ((p >> 16) & 0xFF) * 299 + ((p >> 8) & 0xFF) * 587 + (p & 0xFF) * 114
    }
    var bits = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        if (luma(i, j) < luma(i + 1, j)) bits |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    bits
  }

  /** Decode + re-encode: fresh PNG bytes, identical pixels. */
  def reencodePng(bytes: Array[Byte]): Array[Byte] = {
    val img = readPng(bytes)
    val out = new BufferedImage(img.getWidth, img.getHeight,
      BufferedImage.TYPE_INT_RGB)
    out.getGraphics.drawImage(img, 0, 0, null)
    writePng(out)
  }

  /** One-pixel perturbation: flip the mid-bits of pixel (0, 0) and
    * re-encode — the "slightly edited copy" a perceptual hash must
    * still catch.
    */
  def perturbPng(bytes: Array[Byte]): Array[Byte] = {
    val img = readPng(bytes)
    img.setRGB(0, 0, (img.getRGB(0, 0) ^ 0x404040) & 0xFFFFFF)
    writePng(img)
  }

  private val SampleRate = 8000f

  /** The WAV reader/writer providers resolved ONCE via the public
    * ServiceLoader SPI. `AudioSystem.getAudioInputStream`/`write`
    * re-resolve the provider list behind a GLOBAL lock on every
    * call — measured as a 34× per-payload slowdown under 32 executor
    * threads (graft.tools.CodecProfile: 80 µs single-thread →
    * 2.7 ms effective), which made the audio codec rows read as
    * compute when they were contention. Same decoder class, same
    * real RIFF/PCM parse; only the per-call registry lock goes. The
    * provider instances are stateless (each call parses into fresh
    * objects), so sharing them across threads is safe.
    */
  private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
    while (it.hasNext) b += it.next()
    b.result()
  }

  private lazy val audioWriters: Seq[javax.sound.sampled.spi.AudioFileWriter] = {
    val it = java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
    val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileWriter]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** THE RIFF/WAVE reader, resolved once by probing the provider
    * list with a real WAV — iterating providers per call is a trap:
    * `SoftMidiAudioFileReader` precedes the WAVE reader in the
    * ServiceLoader order and its rejection path funnels through
    * MidiSystem's global provider lock, which is exactly the
    * serialization this cache exists to avoid (32 threads parked on
    * MidiSystem.getSequence in the profile).
    */
  private lazy val wavReader: javax.sound.sampled.spi.AudioFileReader = {
    val probe = wavBytes(16, 0L)
    audioReaders.find { r =>
      try { r.getAudioInputStream(new ByteArrayInputStream(probe)).close(); true }
      catch { case _: Exception => false }
    }.getOrElse(throw new IllegalStateException(
      "no installed AudioFileReader accepts RIFF/WAVE"))
  }

  /** The WAVE writer, resolved once (same rationale). */
  private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter =
    audioWriters.find(_.isFileTypeSupported(AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException(
        "no installed WAVE AudioFileWriter"))

  private def openAudio(bytes: Array[Byte]): AudioInputStream =
    wavReader.getAudioInputStream(new ByteArrayInputStream(bytes))

  private def writeWave(ais: AudioInputStream,
                        bos: ByteArrayOutputStream): Unit =
    wavWriter.write(ais, AudioFileFormat.Type.WAVE, bos)

  /** Deterministic 16-bit mono PCM, wrapped as a real WAV file. */
  def wavBytes(nSamples: Int, seed: Long): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var v = lcg(seed)
    var i = 0
    while (i < nSamples) {
      v = lcg(v)
      val s = (v >>> 40).toShort
      pcm(2 * i) = (s & 0xFF).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(SampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    writeWave(ais, bos)
    bos.toByteArray
  }

  private val VideoMagic = "GFV1".getBytes("US-ASCII")

  /** Deterministic "video": a length-prefixed concatenated-PNG
    * container — magic `GFV1`, big-endian frame count, then per frame
    * a big-endian byte length + real PNG bytes (every frame goes
    * through the actual deflate encoder; the per-frame seed varies so
    * frames differ). This is the container format that closes the
    * video seam with zero external dependencies: the codec work per
    * frame is the same real PNG codec the image path runs.
    */
  def videoBytes(w: Int, h: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(VideoMagic)
    out.writeInt(nFrames)
    var i = 0
    while (i < nFrames) {
      val png = pngBytes(w, h, lcg(seed + i))
      out.writeInt(png.length)
      out.write(png)
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** Real video decode: walk the GFV1 container, decode every frame
    * through the real PNG codec. Returns (frame count, width, height,
    * digest) where digest = md5 over the per-frame pixel digests in
    * frame order — any bit flip in any frame's pixels changes it.
    */
  def decodeVideo(bytes: Array[Byte]): (Int, Int, Int, String) = {
    val in = new java.io.DataInputStream(new ByteArrayInputStream(bytes))
    val magic = new Array[Byte](4)
    in.readFully(magic)
    require(java.util.Arrays.equals(magic, VideoMagic), "not a GFV1 container")
    val n = in.readInt()
    val md = java.security.MessageDigest.getInstance("MD5")
    var w = -1
    var h = -1
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val frame = new Array[Byte](len)
      in.readFully(frame)
      val (fw, fh, dig) = decodePng(frame)
      if (i == 0) { w = fw; h = fh }
      else require(fw == w && fh == h, "frame dimensions must be constant")
      md.update(dig.getBytes("US-ASCII"))
      i += 1
    }
    (n, w, h, md.digest().map("%02x".format(_)).mkString)
  }

  /** Real WAV decode: (sample count, sample rate Hz, md5 of PCM). */
  def decodeWav(bytes: Array[Byte]): (Int, Int, String) = {
    val ais = openAudio(bytes)
    val fmt = ais.getFormat
    val pcm = ais.readAllBytes()
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(pcm)
    (pcm.length / (fmt.getSampleSizeInBits / 8) / fmt.getChannels,
      fmt.getSampleRate.toInt,
      md.digest().map("%02x".format(_)).mkString)
  }

  /** Decoded 16-bit little-endian mono samples via the real RIFF
    * parse — the sample-level seam the audio fingerprint builds on.
    */
  def wavSamples(bytes: Array[Byte]): Array[Short] = {
    val ais = openAudio(bytes)
    val pcm = ais.readAllBytes()
    val n = pcm.length / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((pcm(2 * i) & 0xFF) | (pcm(2 * i + 1) << 8)).toShort
      i += 1
    }
    out
  }

  private def samplesToWav(s: Array[Short]): Array[Byte] = {
    val pcm = new Array[Byte](s.length * 2)
    var i = 0
    while (i < s.length) {
      pcm(2 * i) = (s(i) & 0xFF).toByte
      pcm(2 * i + 1) = ((s(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(SampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, s.length.toLong)
    val bos = new ByteArrayOutputStream()
    writeWave(ais, bos)
    bos.toByteArray
  }

  /** Real decode → fresh RIFF container write; PCM byte-identical,
    * container bytes may differ (the WAV analogue of [[reencodePng]]).
    */
  def reencodeWav(bytes: Array[Byte]): Array[Byte] =
    samplesToWav(wavSamples(bytes))

  /** Gain change: every sample scaled by num/den (integer division,
    * truncation toward zero — keep |num| ≤ |den| to avoid clipping).
    */
  def gainWav(bytes: Array[Byte], num: Int, den: Int): Array[Byte] =
    samplesToWav(wavSamples(bytes).map(s => (s.toInt * num / den).toShort))

  /** Number of fingerprint energy windows ([[fpWav]]): 65 windows
    * yield 64 adjacent-energy comparisons = 64 bits.
    */
  private val FpWindows = 65

  /** A short dropout: zero every sample of fingerprint window `w` —
    * the localized edit whose [[fpWav]] damage is provably ≤ 2 bits
    * (only comparisons w−1→w and w→w+1 see a changed energy).
    */
  def dropoutWav(bytes: Array[Byte], w: Int = 10): Array[Byte] = {
    val s = wavSamples(bytes)
    val n = s.length
    var i = 0
    while (i < n) {
      if ((i.toLong * FpWindows / n).toInt == w) s(i) = 0
      i += 1
    }
    samplesToWav(s)
  }

  /** 64-bit energy-contour audio fingerprint (the Haitsma–Kalker
    * 2002 bit-derivation shape on time-domain window energies): real
    * RIFF/PCM decode, samples split into [[FpWindows]] contiguous
    * windows (sample i → window ⌊i·65/n⌋), E(k) = Σ s², bit k = 1
    * iff E(k+1) > E(k). Invariances that make it a dedup key:
    * re-encoding preserves PCM exactly (same bits); a gain change
    * scales every window energy by the same factor, preserving every
    * comparison (integer-truncation noise is ~3 orders of magnitude
    * below typical window-energy gaps); a localized edit flips at
    * most the comparisons bordering the windows it lands in.
    */
  def fpWav(bytes: Array[Byte]): Long = {
    val s = wavSamples(bytes)
    val n = s.length
    val e = new Array[Long](FpWindows)
    var i = 0
    while (i < n) {
      e((i.toLong * FpWindows / n).toInt) += s(i).toLong * s(i)
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < FpWindows - 1) {
      if (e(k + 1) > e(k)) fp |= (1L << k)
      k += 1
    }
    fp
  }
}
