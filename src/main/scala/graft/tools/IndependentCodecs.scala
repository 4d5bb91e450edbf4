package graft.tools

/** From-scratch media decoders sharing NO code with the JDK codec
  * paths the engine runs in production ([[graft.operators.MediaCodecs]]
  * uses `javax.imageio` / `javax.sound.sampled`): PNG is parsed chunk
  * by chunk here, inflated with raw `java.util.zip.Inflater`, and
  * un-filtered scanline by scanline per the PNG spec; WAV is a direct
  * RIFF chunk walk. Their only purpose is INDEPENDENT verification —
  * the `mm_decode` / `mm_resize` / `dedup_image` queries cannot be
  * DuckDB-oracled (SQL cannot decode PNG), so IndependentCodecSpec
  * pins that the JDK decode and this from-scratch decode agree on
  * every pixel digest, closing the "same library generates and
  * checks" loop.
  *
  * Format references are public: the PNG specification (W3C, RFC
  * 2083) filter types 0-4 and the canonical Paeth predictor; WAVE is
  * the Microsoft RIFF container (fmt/data chunks, little-endian PCM).
  */
object IndependentCodecs {

  // ---------------------------------------------------------------- PNG

  private val PngSignature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  /** Decoded image: `rgb` is 3 bytes per pixel, row-major — exactly
    * the byte stream [[graft.operators.MediaCodecs.decodePng]] digests.
    */
  final case class PureImage(width: Int, height: Int, rgb: Array[Byte])

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  /** Decode a PNG: signature check, chunk walk, IDAT inflate, scanline
    * un-filtering. Supports what a verification target needs: bit
    * depth 8, color types 0 (gray), 2 (RGB) and 6 (RGBA, alpha
    * dropped), no interlace. Anything else throws — this is a checker,
    * not a general viewer.
    */
  def decodePng(bytes: Array[Byte]): PureImage = {
    require(bytes.length > 8 &&
      java.util.Arrays.equals(bytes.take(8), PngSignature), "not a PNG")
    var pos = 8
    var width = -1
    var height = -1
    var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      val len = be32(bytes, pos)
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      val dataOff = pos + 8
      ctype match {
        case "IHDR" =>
          width = be32(bytes, dataOff)
          height = be32(bytes, dataOff + 4)
          val bitDepth = bytes(dataOff + 8) & 0xFF
          colorType = bytes(dataOff + 9) & 0xFF
          val interlace = bytes(dataOff + 12) & 0xFF
          require(bitDepth == 8, s"unsupported bit depth $bitDepth")
          require(colorType == 0 || colorType == 2 || colorType == 6,
            s"unsupported color type $colorType")
          require(interlace == 0, "interlaced PNG not supported")
        case "IDAT" => idat.write(bytes, dataOff, len)
        case "IEND" => done = true
        case _ => () // ancillary chunk — irrelevant to pixels
      }
      pos = dataOff + len + 4 // skip data + CRC
    }
    require(width > 0 && height > 0, "missing IHDR")
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
    }
    val stride = width * channels
    val raw = inflate(idat.toByteArray, (stride + 1) * height)
    require(raw.length == (stride + 1) * height,
      s"inflated ${raw.length} bytes, expected ${(stride + 1) * height}")
    // un-filter in place, scanline by scanline (PNG filters 0-4)
    val recon = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xFF
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xFF
        val left = if (x >= channels) recon(rowOut + x - channels) & 0xFF else 0
        val up = if (y > 0) recon(rowOut - stride + x) & 0xFF else 0
        val upLeft =
          if (y > 0 && x >= channels) recon(rowOut - stride + x - channels) & 0xFF
          else 0
        val v = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, upLeft)
          case other => throw new IllegalArgumentException(s"bad filter $other")
        }
        recon(rowOut + x) = (v & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    // project to 3-byte RGB (replicate gray, drop alpha)
    val rgb = new Array[Byte](width * height * 3)
    var i = 0
    var o = 0
    while (i < stride * height) {
      channels match {
        case 1 =>
          rgb(o) = recon(i); rgb(o + 1) = recon(i); rgb(o + 2) = recon(i)
          i += 1
        case 3 =>
          rgb(o) = recon(i); rgb(o + 1) = recon(i + 1); rgb(o + 2) = recon(i + 2)
          i += 3
        case 4 =>
          rgb(o) = recon(i); rgb(o + 1) = recon(i + 1); rgb(o + 2) = recon(i + 2)
          i += 4
      }
      o += 3
    }
    PureImage(width, height, rgb)
  }

  /** The canonical Paeth predictor from the PNG spec. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(expected)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (n == 0 && inf.needsDictionary())
        throw new IllegalArgumentException("preset dictionary not supported")
    }
    inf.end()
    out.toByteArray
  }

  private def md5hex(update: java.security.MessageDigest => Unit): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    update(md)
    md.digest().map("%02x".format(_)).mkString
  }

  /** md5 over the decoded RGB bytes, row-major — the digest contract
    * of [[graft.operators.MediaCodecs.decodePng]], recomputed from the
    * independent decode.
    */
  def pngPixelDigest(bytes: Array[Byte]): String = {
    val img = decodePng(bytes)
    md5hex(_.update(img.rgb))
  }

  /** (width, height) from the independent decode. */
  def pngDims(bytes: Array[Byte]): (Int, Int) = {
    val img = decodePng(bytes)
    (img.width, img.height)
  }

  /** (width, height, pixel digest) in ONE decode — the in-plan
    * cross-decoder guard calls this per image (guarding every row of
    * `mm_decode`), so the independent side must not decode twice.
    */
  def pngFeatures(bytes: Array[Byte]): (Int, Int, String) = {
    val img = decodePng(bytes)
    (img.width, img.height, md5hex(_.update(img.rgb)))
  }

  /** The 9×8-grid 64-bit dHash recomputed over the independently
    * decoded pixels — same integer formula as
    * [[graft.operators.MediaCodecs.dHashPng]], different decoder.
    */
  def pngDHash(bytes: Array[Byte]): Long = {
    val img = decodePng(bytes)
    def luma(i: Int, j: Int): Int = {
      val off = ((j * img.height / 8) * img.width + (i * img.width / 9)) * 3
      (img.rgb(off) & 0xFF) * 299 + (img.rgb(off + 1) & 0xFF) * 587 +
        (img.rgb(off + 2) & 0xFF) * 114
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

  // ---------------------------------------------------------------- WAV

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** Parse a RIFF/WAVE file directly: (sample count, sample rate Hz,
    * md5 of the data-chunk PCM bytes) — the triple
    * [[graft.operators.MediaCodecs.decodeWav]] reports via
    * javax.sound.sampled.
    */
  def decodeWav(bytes: Array[Byte]): (Int, Int, String) = {
    require(bytes.length > 12 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a RIFF/WAVE file")
    var pos = 12
    var sampleRate = -1
    var blockAlign = -1
    var pcm: Array[Byte] = null
    while (pos + 8 <= bytes.length && (sampleRate < 0 || pcm == null)) {
      val ctype = new String(bytes, pos, 4, "US-ASCII")
      val len = le32(bytes, pos + 4)
      ctype match {
        case "fmt " =>
          require(le16(bytes, pos + 8) == 1, "not PCM")
          sampleRate = le32(bytes, pos + 12)
          blockAlign = le16(bytes, pos + 20)
        case "data" =>
          pcm = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case _ => ()
      }
      pos += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    require(sampleRate > 0 && pcm != null && blockAlign > 0, "missing fmt/data")
    (pcm.length / blockAlign, sampleRate, md5hex(_.update(pcm)))
  }

  /** From-scratch energy-contour audio fingerprint over this file's
    * own RIFF parse — the independent twin of
    * [[graft.operators.MediaCodecs.fpWav]] (65 windows, E = Σ s²,
    * bit k = E(k+1) > E(k)), sharing no code with the JDK-backed
    * implementation.
    */
  def wavFingerprint(bytes: Array[Byte]): Long = {
    var pos = 12
    var pcm: Array[Byte] = null
    while (pos + 8 <= bytes.length && pcm == null) {
      val ctype = new String(bytes, pos, 4, "US-ASCII")
      val len = le32(bytes, pos + 4)
      if (ctype == "data")
        pcm = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
      pos += 8 + len + (len & 1)
    }
    require(pcm != null, "missing data chunk")
    val n = pcm.length / 2
    val e = new Array[Long](65)
    var i = 0
    while (i < n) {
      val s = ((pcm(2 * i) & 0xFF) | (pcm(2 * i + 1) << 8)).toShort.toLong
      e((i.toLong * 65 / n).toInt) += s * s
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 64) {
      if (e(k + 1) > e(k)) fp |= (1L << k)
      k += 1
    }
    fp
  }

  // --------------------------------------------------------------- GFV1

  /** Walk the GFV1 concatenated-PNG container with the independent PNG
    * decoder: (frame count, width, height, md5 over the per-frame
    * pixel digests) — the quadruple
    * [[graft.operators.MediaCodecs.decodeVideo]] reports.
    */
  def decodeVideo(bytes: Array[Byte]): (Int, Int, Int, String) = {
    require(new String(bytes, 0, 4, "US-ASCII") == "GFV1", "not GFV1")
    val n = be32(bytes, 4)
    var pos = 8
    var w = -1
    var h = -1
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val len = be32(bytes, pos)
      val frame = java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 4 + len)
      val img = decodePng(frame)
      if (i == 0) { w = img.width; h = img.height }
      else require(img.width == w && img.height == h, "frame dims vary")
      md.update(md5hex(_.update(img.rgb)).getBytes("US-ASCII"))
      pos += 4 + len
      i += 1
    }
    (n, w, h, md.digest().map("%02x".format(_)).mkString)
  }
}
