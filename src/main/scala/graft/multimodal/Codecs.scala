package graft.multimodal

import Binary.{FeatureExtractor, MediaDecoder, MediaMeta}

/** Real pure-JVM codecs for two trivial PUBLIC formats — netpbm PGM
  * (P5 binary / P2 ASCII grayscale) and uncompressed 24/32-bit BI_RGB
  * BMP — so the multimodal boundary has one genuine decode path in
  * addition to [[Binary.StubDecoder]] (which stays the test default:
  * the stub's closed-form metadata is what the oracle-checked m01/m02
  * queries pin, and this container ships no media libraries for
  * anything richer).
  *
  * Both formats are bytes-in/struct-out with no external dependency,
  * which makes them the honest smallest instance of the production
  * contract: [[Codecs.PgmBmpDecoder]] drops into
  * [[Binary.decodePartitions]] unchanged, and
  * [[Codecs.GrayGridExtractor]] turns decoded PIXELS (not byte
  * hashes) into a fixed-width embedding through
  * [[Binary.extractFeaturesPartitions]] — the same `array<float>`
  * schema the ANN family consumes. A malformed payload fails loudly
  * ([[IllegalArgumentException]]); feeding media through a
  * best-effort silent fallback is how corrupt bytes poison a corpus.
  */
object Codecs {

  /** Parsed grayscale image: row-major pixels in [0, maxval]. */
  final case class GrayImage(width: Int, height: Int, pixels: Array[Int])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"media decode: $msg")

  /** Pixel count computed in LONG — a crafted header like 65536×65536
    * overflows `w * h` to 0 in Int, bypassing every truncated-raster
    * guard and letting a gate report ok=1 for a zero-pixel image with
    * absurd dimensions. Headers claiming more pixels than any payload
    * could back fail here, BEFORE any allocation. */
  private def pixelCount(w: Int, h: Int): Int = {
    val n = w.toLong * h
    if (n > Int.MaxValue) fail(s"pixel count ${w}x$h overflows")
    n.toInt
  }

  // ---- PGM (netpbm portable graymap; public spec: netpbm(5)) -------

  /** Header scanner: netpbm tokens are separated by whitespace, and a
    * `#` starts a comment running to end-of-line — anywhere between
    * tokens, including between magic and width. */
  private final class Tokens(bytes: Array[Byte], var pos: Int) {
    def next(): String = {
      while (pos < bytes.length) {
        val c = bytes(pos).toChar
        if (c == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
        else if (c.isWhitespace) pos += 1
        else {
          val start = pos
          while (pos < bytes.length && !bytes(pos).toChar.isWhitespace &&
            bytes(pos).toChar != '#') pos += 1
          return new String(bytes, start, pos - start, "US-ASCII")
        }
      }
      fail("truncated header")
    }
    def int(what: String): Int = {
      val t = next()
      try t.toInt catch { case _: NumberFormatException => fail(s"bad $what '$t'") }
    }
  }

  def isPgm(payload: Array[Byte]): Boolean =
    payload.length >= 2 && payload(0) == 'P' &&
      (payload(1) == '5' || payload(1) == '2')

  /** Decode P5 (binary, maxval ≤ 255 ⇒ 1 byte/pixel) or P2 (ASCII). */
  def decodePgm(payload: Array[Byte]): GrayImage = {
    if (!isPgm(payload)) fail("not a PGM payload")
    val binary = payload(1) == '5'
    val tk = new Tokens(payload, 2)
    val w = tk.int("width"); val h = tk.int("height")
    val maxval = tk.int("maxval")
    if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
    if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
    val n = pixelCount(w, h)
    // raster-claim bounds BEFORE any allocation — a header under the
    // Int.MaxValue guard can still claim ~2G pixels, and allocating
    // first would turn one crafted row into a multi-GB OOM Error
    // instead of the gate's clean quarantine. Binary: exactly ONE
    // whitespace byte separates maxval from raster; ASCII pixels need
    // ≥2 bytes each (digit + separator).
    val start = tk.pos + 1
    if (binary && start.toLong + n > payload.length) fail("truncated P5 raster")
    if (!binary && n.toLong > payload.length) fail("truncated P2 raster")
    val px = new Array[Int](n)
    if (binary) {
      var i = 0
      while (i < n) { px(i) = payload(start + i) & 0xff; i += 1 }
    } else {
      var i = 0
      while (i < n) {
        val v = tk.int("pixel")
        if (v < 0 || v > maxval) fail(s"pixel $v out of [0,$maxval]")
        px(i) = v; i += 1
      }
    }
    GrayImage(w, h, px)
  }

  // ---- BMP (Windows BITMAPINFOHEADER, uncompressed BI_RGB) ---------

  def isBmp(payload: Array[Byte]): Boolean =
    payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M'

  private def le32(b: Array[Byte], off: Int): Int =
    if (off + 4 > b.length) fail("truncated BMP header")
    else (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    if (off + 2 > b.length) fail("truncated BMP header")
    else (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Decode an uncompressed 24/32-bit BMP to grayscale (integer ITU
    * luma: (77·R + 150·G + 29·B) >> 8 — pure-integer, engine-exact).
    * Handles 4-byte row padding and the bottom-up raster (negative
    * biHeight = top-down). */
  def decodeBmp(payload: Array[Byte]): GrayImage = {
    if (!isBmp(payload)) fail("not a BMP payload")
    val dataOff = le32(payload, 10)
    val w = le32(payload, 18)
    val hRaw = le32(payload, 22)
    val bpp = le16(payload, 28)
    val compression = le32(payload, 30)
    if (compression != 0) fail(s"unsupported BMP compression $compression")
    if (bpp != 24 && bpp != 32) fail(s"unsupported BMP bit depth $bpp")
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0) fail(s"bad dimensions ${w}x$h")
    val bytesPp = bpp / 8
    val rowBytesL = ((w.toLong * bytesPp + 3) / 4) * 4 // rows pad to 4 bytes
    if (dataOff < 0 || dataOff.toLong + rowBytesL * h > payload.length)
      fail("truncated BMP raster")
    val rowBytes = rowBytesL.toInt // raster fits the payload ⇒ fits Int
    val px = new Array[Int](pixelCount(w, h))
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      var x = 0
      while (x < w) {
        val o = dataOff + srcRow * rowBytes + x * bytesPp
        val blue = payload(o) & 0xff
        val green = payload(o + 1) & 0xff
        val red = payload(o + 2) & 0xff
        px(y * w + x) = (77 * red + 150 * green + 29 * blue) >> 8
        x += 1
      }
      y += 1
    }
    GrayImage(w, h, px)
  }

  // ---- PPM (netpbm portable pixmap — the COLOR sibling) ------------

  /** Parsed RGB image: row-major per-channel samples in [0, maxval]. */
  final case class RgbImage(width: Int, height: Int,
                            r: Array[Int], g: Array[Int], b: Array[Int])

  def isPpm(payload: Array[Byte]): Boolean =
    payload.length >= 2 && payload(0) == 'P' &&
      (payload(1) == '6' || payload(1) == '3')

  /** Decode netpbm PPM (P6 binary / P3 ASCII) — same header grammar
    * as PGM (comments anywhere between tokens), three interleaved
    * samples per pixel in the raster. */
  def decodePpm(payload: Array[Byte]): RgbImage = {
    if (!isPpm(payload)) fail("not a PPM payload")
    val binary = payload(1) == '6'
    val tk = new Tokens(payload, 2)
    val w = tk.int("width"); val h = tk.int("height")
    val maxval = tk.int("maxval")
    if (w <= 0 || h <= 0) fail(s"bad dimensions ${w}x$h")
    if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
    val n = pixelCount(w, h)
    // raster-claim bounds BEFORE any allocation (decodePgm's OOM
    // argument, ×3 channels here)
    val start = tk.pos + 1
    if (binary && start + 3L * n > payload.length) fail("truncated P6 raster")
    if (!binary && 3L * n > payload.length) fail("truncated P3 raster")
    val r = new Array[Int](n); val g = new Array[Int](n)
    val b = new Array[Int](n)
    if (binary) {
      var i = 0
      while (i < n) {
        r(i) = payload(start + 3 * i) & 0xff
        g(i) = payload(start + 3 * i + 1) & 0xff
        b(i) = payload(start + 3 * i + 2) & 0xff
        i += 1
      }
    } else {
      var i = 0
      while (i < n) {
        val (rv, gv, bv) = (tk.int("r"), tk.int("g"), tk.int("b"))
        if (rv > maxval || gv > maxval || bv > maxval ||
          rv < 0 || gv < 0 || bv < 0) fail("sample out of [0,maxval]")
        r(i) = rv; g(i) = gv; b(i) = bv; i += 1
      }
    }
    RgbImage(w, h, r, g, b)
  }

  /** RGB → grayscale through the SAME integer ITU luma the BMP path
    * uses ((77·R + 150·G + 29·B) >> 8) — one luma rule across every
    * color ingress, so a color payload and its pre-grayed twin hash
    * identically ([[aHash64]] invariance across formats AND color). */
  def toGray(img: RgbImage): GrayImage = {
    val px = new Array[Int](img.r.length)
    var i = 0
    while (i < px.length) {
      px(i) = (77 * img.r(i) + 150 * img.g(i) + 29 * img.b(i)) >> 8
      i += 1
    }
    GrayImage(img.width, img.height, px)
  }

  /** The real [[MediaDecoder]]: netpbm (PGM gray, PPM color) and BMP
    * payloads produce their true dimensions; anything else fails
    * loudly. Drops into [[Binary.decodePartitions]] in place of the
    * stub. */
  object PgmBmpDecoder extends MediaDecoder {
    override def decode(payload: Array[Byte]): MediaMeta =
      if (isPgm(payload)) {
        val img = decodePgm(payload)
        MediaMeta(img.width, img.height, channels = 1, nBytes = payload.length.toLong)
      } else if (isPpm(payload)) {
        val img = decodePpm(payload)
        MediaMeta(img.width, img.height, channels = 3,
          nBytes = payload.length.toLong)
      } else if (isBmp(payload)) {
        val img = decodeBmp(payload)
        val bpp = le16(payload, 28)
        MediaMeta(img.width, img.height, channels = bpp / 8,
          nBytes = payload.length.toLong)
      } else fail("unsupported format (PGM/PPM/BMP)")
  }

  /** Real pixel features: mean intensity (normalized to [0,1]) over a
    * `gx`×`gy` grid of the decoded image — the smallest honest
    * "feature extractor over pixels, not payload hashes". Grid cells
    * partition the image by integer bounds (cell i spans
    * [i·w/gx, (i+1)·w/gx)), so any image size ≥ grid works and the
    * result is deterministic. Output length `gx·gy` matches the
    * embeddings-table `array<float>` contract. */
  final class GrayGridExtractor(gx: Int = 2, gy: Int = 2) extends FeatureExtractor {
    require(gx > 0 && gy > 0, s"grid ${gx}x$gy")
    override val dim: Int = gx * gy
    override def features(payload: Array[Byte]): Array[Float] = {
      val img = if (isPgm(payload)) decodePgm(payload) else decodeBmp(payload)
      if (img.width < gx || img.height < gy)
        fail(s"image ${img.width}x${img.height} smaller than ${gx}x$gy grid")
      val out = new Array[Float](dim)
      var cy = 0
      while (cy < gy) {
        val y0 = cy * img.height / gy; val y1 = (cy + 1) * img.height / gy
        var cx = 0
        while (cx < gx) {
          val x0 = cx * img.width / gx; val x1 = (cx + 1) * img.width / gx
          var sum = 0L; var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { sum += img.pixels(y * img.width + x); x += 1 }
            y += 1
          }
          val cells = (y1 - y0).toLong * (x1 - x0)
          out(cy * gx + cx) = (sum.toDouble / (cells * 255.0)).toFloat
          cx += 1
        }
        cy += 1
      }
      out
    }
  }

  // ---- encoders (test fixtures + round-trip evidence) --------------

  /** Encode a [[GrayImage]] as ASCII P2 — the SAME image in a
    * different wire format, which is exactly what byte-level
    * fingerprints (m03's CDC-chunk minhash) cannot see through and
    * pixel-level hashes ([[aHash64]]) are invariant to. */
  def encodePgmP2(img: GrayImage): Array[Byte] = {
    require(img.pixels.length == img.width * img.height, "pixel count")
    val sb = new StringBuilder(s"P2\n${img.width} ${img.height}\n255\n")
    var i = 0
    while (i < img.pixels.length) {
      val v = img.pixels(i)
      require(v >= 0 && v <= 255, s"pixel $v")
      sb.append(v)
      sb.append(if ((i + 1) % img.width == 0) '\n' else ' ')
      i += 1
    }
    sb.toString.getBytes("US-ASCII")
  }

  /** 64-bit average-hash (aHash) of DECODED pixels — the classic
    * perceptual fingerprint: 8×8 block means thresholded at their own
    * global mean. Because it hashes pixels, not bytes, the SAME image
    * re-encoded (P5 ↔ P2, different comment headers, BMP) maps to the
    * IDENTICAL 64-bit value — the representation-invariance m03's
    * byte-level fingerprint fundamentally lacks — and small pixel
    * edits flip few block bits (hamming-near). Integer arithmetic
    * only (block sums / integer means), so the hash is exactly
    * reproducible everywhere. */
  def aHash64(img: GrayImage): Long = {
    val (w, h) = (img.width, img.height)
    require(w >= 8 && h >= 8, s"aHash needs >= 8x8 pixels, got ${w}x$h")
    val means = new Array[Long](64)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
        val y0 = by * h / 8; val y1 = (by + 1) * h / 8
        var s = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += img.pixels(y * w + x); n += 1; x += 1 }
          y += 1
        }
        means(by * 8 + bx) = if (n == 0) 0L else s / n
        bx += 1
      }
      by += 1
    }
    val avg = means.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) { if (means(i) > avg) bits |= (1L << i); i += 1 }
    bits
  }

  /** Decode either supported format to pixels (the [[aHash64]] input
    * path: payload → [[GrayImage]] regardless of wire format). */
  def decodeGray(payload: Array[Byte]): GrayImage =
    if (isPgm(payload)) decodePgm(payload)
    else if (isPpm(payload)) toGray(decodePpm(payload))
    else if (isBmp(payload)) decodeBmp(payload)
    else fail("unknown format (not PGM, PPM or BMP)")

  /** Deterministic grayscale "render" of a text payload: 32×32 pixels
    * resampled from the UTF-8 byte sequence (pixel i reads the byte
    * at the proportional position i·n/1024). The test corpus ships no
    * real thumbnails, so this is the stand-in that preserves the
    * property perceptual hashing needs: identical content → identical
    * pixels, lightly-edited content → mostly-identical block means. */
  def renderGray(text: String): GrayImage = {
    val raw = text.getBytes("UTF-8")
    // an empty document renders as the all-zero image (hash 0) rather
    // than crashing the partition — empty payloads are a data reality
    val bytes = if (raw.isEmpty) Array[Byte](0) else raw
    val n = bytes.length
    val px = new Array[Int](32 * 32)
    var i = 0
    while (i < px.length) {
      px(i) = bytes(((i.toLong * n) / px.length).toInt % n) & 0xFF
      i += 1
    }
    GrayImage(32, 32, px)
  }

  /** Encode a [[GrayImage]] as binary P5 — gives specs REAL bytes to
    * decode and proves the header writer/parser agree. */
  def encodePgmP5(img: GrayImage): Array[Byte] = {
    require(img.pixels.length == img.width * img.height, "pixel count")
    val header = s"P5\n# graft test fixture\n${img.width} ${img.height}\n255\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < img.pixels.length) {
      val v = img.pixels(i)
      require(v >= 0 && v <= 255, s"pixel $v")
      out(header.length + i) = v.toByte
      i += 1
    }
    out
  }

  /** Deterministic COLOR "render" of a text payload — the RGB sibling
    * of [[renderGray]]: each channel resamples the UTF-8 byte
    * sequence at a different phase (thirds of the stream), so the
    * channels are genuinely distinct (toGray is NOT the identity on
    * it) while identical content still renders identical pixels. */
  def renderRgb(text: String): RgbImage = {
    val raw = text.getBytes("UTF-8")
    val bytes = if (raw.isEmpty) Array[Byte](0) else raw
    val n = bytes.length
    val size = 32 * 32
    val r = new Array[Int](size); val g = new Array[Int](size)
    val b = new Array[Int](size)
    var i = 0
    while (i < size) {
      def at(phase: Int): Int =
        bytes((((i.toLong * n) / size + phase.toLong * n / 3) % n).toInt) & 0xFF
      r(i) = at(0); g(i) = at(1); b(i) = at(2)
      i += 1
    }
    RgbImage(32, 32, r, g, b)
  }

  /** Encode an [[RgbImage]] as binary P6 (round-trip evidence +
    * real color bytes for the m05 path). */
  def encodePpmP6(img: RgbImage): Array[Byte] = {
    require(img.r.length == img.width * img.height, "pixel count")
    val header = s"P6\n# graft test fixture\n${img.width} ${img.height}\n255\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + 3 * img.r.length)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < img.r.length) {
      def chk(v: Int): Byte = {
        require(v >= 0 && v <= 255, s"sample $v"); v.toByte
      }
      out(header.length + 3 * i) = chk(img.r(i))
      out(header.length + 3 * i + 1) = chk(img.g(i))
      out(header.length + 3 * i + 2) = chk(img.b(i))
      i += 1
    }
    out
  }

  /** Encode an [[RgbImage]] as ASCII P3 — the same pixels in a
    * different wire format (the m04 trick, in color). */
  def encodePpmP3(img: RgbImage): Array[Byte] = {
    require(img.r.length == img.width * img.height, "pixel count")
    val sb = new StringBuilder
    sb.append(s"P3\n# graft test fixture\n${img.width} ${img.height}\n255\n")
    var i = 0
    while (i < img.r.length) {
      sb.append(img.r(i)).append(' ').append(img.g(i)).append(' ')
        .append(img.b(i)).append(if ((i + 1) % img.width == 0) '\n' else ' ')
      i += 1
    }
    sb.toString.getBytes("US-ASCII")
  }

  /** Encode gray pixels as a bottom-up 24-bit BI_RGB BMP (R=G=B). */
  def encodeBmp24(img: GrayImage): Array[Byte] = {
    val rowBytes = ((img.width * 3 + 3) / 4) * 4
    val dataSize = rowBytes * img.height
    val out = new Array[Byte](54 + dataSize)
    def put32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def put16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    put32(2, out.length); put32(10, 54)
    put32(14, 40); put32(18, img.width); put32(22, img.height)
    put16(26, 1); put16(28, 24); put32(30, 0); put32(34, dataSize)
    var y = 0
    while (y < img.height) {
      val dstRow = img.height - 1 - y // bottom-up
      var x = 0
      while (x < img.width) {
        val v = img.pixels(y * img.width + x).toByte
        val o = 54 + dstRow * rowBytes + x * 3
        out(o) = v; out(o + 1) = v; out(o + 2) = v
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- WAV / PCM (the audio leg of the multimodal boundary) ----

  /** Mono 16-bit PCM audio. */
  final case class PcmAudio(sampleRate: Int, samples: Array[Short]) {
    override def equals(o: Any): Boolean = o match {
      case p: PcmAudio =>
        p.sampleRate == sampleRate &&
          java.util.Arrays.equals(p.samples, samples)
      case _ => false
    }
    override def hashCode: Int =
      sampleRate * 31 + java.util.Arrays.hashCode(samples)
  }

  def isWav(payload: Array[Byte]): Boolean =
    payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' &&
      payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' &&
      payload(11) == 'E'

  /** Deterministic PCM "render" of a text payload — the audio sibling
    * of [[renderGray]]: a fixed-length waveform resampled from the
    * UTF-8 byte sequence (centered to signed full scale), framed by
    * text-length-derived leading/trailing silence so the trim
    * operator has real work. Identical content → identical samples;
    * empty documents render as pure silence rather than crashing. */
  def renderPcm(text: String, sampleRate: Int = 8000): PcmAudio = {
    val raw = text.getBytes("UTF-8")
    val bytes = if (raw.isEmpty) Array[Byte](-128) else raw // byte 128 → 0
    val n = bytes.length
    val total = 2048
    val lead = 64 + (n % 5) * 32
    val trail = 64 + (n % 7) * 32
    val body = total - lead - trail
    val out = new Array[Short](total)
    var i = 0
    while (i < body) {
      val b = bytes(((i.toLong * n) / body).toInt % n) & 0xFF
      out(lead + i) = ((b - 128) * 256).toShort
      i += 1
    }
    PcmAudio(sampleRate, out)
  }

  private def putLe32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
  }

  private def putLe16(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
  }

  /** Encode as a real RIFF/WAVE file (PCM16LE mono). With
    * `extraChunk` an unknown ODD-length `LIST` chunk precedes `fmt `
    * — RIFF pads odd chunks to even, so every decode through the
    * production path also proves the walker honors the padding rule
    * and skips chunks it doesn't know (the wire-robustness evidence
    * m04 gets from its P5/P2 double-encode). */
  def encodeWav(a: PcmAudio, extraChunk: Boolean = false): Array[Byte] = {
    val junk = if (extraChunk) "graft".getBytes("US-ASCII") else Array.emptyByteArray
    val junkPadded = junk.length + (junk.length & 1)
    val extraLen = if (extraChunk) 8 + junkPadded else 0
    val dataLen = a.samples.length * 2
    val riffLen = 4 + extraLen + 24 + 8 + dataLen
    val out = new Array[Byte](8 + riffLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, riffLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    var o = 12
    if (extraChunk) {
      out(o) = 'L'; out(o + 1) = 'I'; out(o + 2) = 'S'; out(o + 3) = 'T'
      putLe32(out, o + 4, junk.length) // true (odd) size; pad byte follows
      System.arraycopy(junk, 0, out, o + 8, junk.length)
      o += 8 + junkPadded
    }
    out(o) = 'f'; out(o + 1) = 'm'; out(o + 2) = 't'; out(o + 3) = ' '
    putLe32(out, o + 4, 16)
    putLe16(out, o + 8, 1) // PCM
    putLe16(out, o + 10, 1) // mono
    putLe32(out, o + 12, a.sampleRate)
    putLe32(out, o + 16, a.sampleRate * 2) // byte rate
    putLe16(out, o + 20, 2) // block align
    putLe16(out, o + 22, 16) // bits
    o += 24
    out(o) = 'd'; out(o + 1) = 'a'; out(o + 2) = 't'; out(o + 3) = 'a'
    putLe32(out, o + 4, dataLen)
    var i = 0
    while (i < a.samples.length) {
      putLe16(out, o + 8 + 2 * i, a.samples(i) & 0xFFFF)
      i += 1
    }
    out
  }

  /** Parse a RIFF/WAVE payload: chunk walk (unknown chunks skipped,
    * odd sizes padded per the RIFF rule), `fmt ` validated as PCM16
    * mono, `data` decoded LE16. Fails loudly on anything else —
    * a truncated or non-WAV payload must never parse as silence. */
  def decodeWav(payload: Array[Byte]): PcmAudio = {
    if (!isWav(payload)) fail("not a RIFF/WAVE payload")
    var o = 12
    var sampleRate = -1
    var samples: Array[Short] = null
    while (o + 8 <= payload.length && (sampleRate < 0 || samples == null)) {
      val id = new String(payload.slice(o, o + 4), "US-ASCII")
      val size = le32(payload, o + 4)
      if (size < 0 || o + 8 + size > payload.length)
        fail(s"chunk '$id' overruns the payload")
      id match {
        case "fmt " =>
          if (size < 16) fail("fmt chunk too short")
          if (le16(payload, o + 8) != 1) fail("not PCM")
          if (le16(payload, o + 10) != 1) fail("not mono")
          if (le16(payload, o + 22) != 16) fail("not 16-bit")
          sampleRate = le32(payload, o + 12)
        case "data" =>
          if (sampleRate < 0) fail("data chunk before fmt")
          if ((size & 1) == 1) fail("odd PCM16 data length")
          val n = size / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) {
            s(i) = ((payload(o + 8 + 2 * i) & 0xFF) |
              (payload(o + 9 + 2 * i) << 8)).toShort
            i += 1
          }
          samples = s
        case _ => () // unknown chunk: skip
      }
      o += 8 + size + (size & 1) // RIFF pads odd chunks to even
    }
    if (sampleRate < 0 || samples == null) fail("missing fmt/data chunk")
    PcmAudio(sampleRate, samples)
  }

  /** Drop leading/trailing silence (|x| below `threshold`). An
    * all-silent waveform trims to empty — a legal PCM payload. */
  def trimSilence(a: PcmAudio, threshold: Int = 256): PcmAudio = {
    val n = a.samples.length
    var lo = 0
    while (lo < n && math.abs(a.samples(lo).toInt) < threshold) lo += 1
    var hi = n
    while (hi > lo && math.abs(a.samples(hi - 1).toInt) < threshold) hi -= 1
    PcmAudio(a.sampleRate, java.util.Arrays.copyOfRange(a.samples, lo, hi))
  }

  /** Floor integer square root (exact — no float round-trip). */
  def isqrt(v: Long): Long = {
    require(v >= 0, s"isqrt($v)")
    var r = math.sqrt(v.toDouble).toLong
    while ((r + 1) * (r + 1) <= v) r += 1
    while (r * r > v) r -= 1
    r
  }
}
