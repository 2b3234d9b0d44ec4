package graft.scale

import java.io.ByteArrayInputStream

/** Real image decoding for the multimodal codec seam.
  *
  * [[decodeGray]] sniffs the payload's magic bytes and decodes recognized
  * raster formats to row-major 8-bit grayscale: PPM (P6) / PGM (P5) via a
  * self-contained parser (uncompressed, pure JVM), PNG / BMP / GIF via
  * `javax.imageio` (in-JDK, headless). Unrecognized payloads return None —
  * [[gridOrStub]] then falls back to [[Multimodal.StubCodec.grayGrid]]'s
  * md5-derived grid, which keeps text-corpus pHash queries deterministic
  * and DuckDB-replayable while REAL image bytes flow through a real
  * decode → box-filter → DCT path.
  *
  * Luma is the integer ITU-R BT.601 weighting (299·R + 587·G + 114·B,
  * rounded) — exact integer arithmetic, so any engine replays it.
  * Reference scope note: the reference pipeline is text-only
  * (fast_ai_wrangler has no media path); this seam exists for the
  * north-star multimodal family.
  */
object Codec {

  /** Pixel-count ceiling (2^26 ≈ 67M px ≈ 256 MB of int): a decoded frame
    * must fit comfortably in one task's lap — larger blobs are refused,
    * not decoded (the caller's stub fallback keeps the row flowing).
    */
  private val MaxPixels = 1L << 26

  /** Sniff + decode to (width, height, grayscale 0-255 row-major). */
  def decodeGray(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    // 12 bytes is the smallest parseable frame ("P5\n1 1\n255\n" + 1
    // raster byte); anything shorter cannot carry a header + raster
    if (payload == null || payload.length < 12) None
    else if (payload(0) == 'P' &&
      (payload(1) == '5' || payload(1) == '6') && isSpace(payload(2)))
      decodePnm(payload)
    else if (looksImageIo(payload)) decodeImageIo(payload)
    else None
  }

  /** Box-filter a decoded frame to the 8×8 grid [[Multimodal.dctPhash]]
    * consumes: integer mean over each cell (cells clamp to at least one
    * pixel, so frames smaller than 8×8 replicate edge pixels).
    */
  def grayGrid8(w: Int, h: Int, px: Array[Int]): Array[Int] = {
    require(w > 0 && h > 0 && px.length == w * h,
      s"bad frame: ${w}x$h with ${px.length} px")
    val out = new Array[Int](64)
    var gy = 0
    while (gy < 8) {
      val y0 = math.min(gy * h / 8, h - 1)
      val y1 = math.max(math.min((gy + 1) * h / 8, h), y0 + 1)
      var gx = 0
      while (gx < 8) {
        val x0 = math.min(gx * w / 8, w - 1)
        val x1 = math.max(math.min((gx + 1) * w / 8, w), x0 + 1)
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += px(y * w + x); x += 1 }
          y += 1
        }
        out(gy * 8 + gx) = (s / ((y1 - y0).toLong * (x1 - x0))).toInt
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** The live seam: real decode when the payload is a recognized image,
    * the md5 stub grid otherwise (text corpora stay oracle-replayable).
    */
  def gridOrStub(payload: Array[Byte]): Array[Int] =
    decodeGray(payload) match {
      case Some((w, h, px)) => grayGrid8(w, h, px)
      case None             => Multimodal.StubCodec.grayGrid(payload)
    }

  /** Sample-count ceiling for audio (2^24 samples ≈ 64 MB of int ≈ 6 min
    * at 44.1 kHz): larger payloads are refused, not decoded — the
    * caller's stub fallback keeps the row flowing (the MaxPixels rule).
    */
  private val MaxSamples = 1L << 24

  /** REAL PCM WAV decode — self-contained RIFF parse (pure JVM, no
    * codec libraries): 'RIFF'/'WAVE' magic, 'fmt ' chunk (format 1 =
    * uncompressed PCM, 16-bit only), 'data' chunk as little-endian
    * int16 frames. Multi-channel audio downmixes to mono by TRUNCATING
    * integer mean (sum / channels, Java semantics) — exact integers, so
    * any engine replays the downstream stats. Chunks are word-aligned
    * (odd sizes pad one byte) per the RIFF spec; unknown chunks skip.
    * Anything unparseable (or over [[MaxSamples]]) returns None.
    *
    * @return (sample_rate, mono samples in [-32768, 32767])
    */
  def decodePcmWav(p: Array[Byte]): Option[(Int, Array[Int])] = {
    if (p == null || p.length < 44 ||
      p(0) != 'R' || p(1) != 'I' || p(2) != 'F' || p(3) != 'F' ||
      p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E')
      return None
    def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def le32(o: Int): Long =
      (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
        ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    var off = 12L
    var rate = 0L
    var ch = 0
    var bits = 0
    var dataOff = -1L
    var dataLen = 0L
    while (off + 8 <= p.length && (dataOff < 0 || rate == 0)) {
      val o = off.toInt
      val id = new String(p, o, 4, "US-ASCII")
      val sz = le32(o + 4)
      if (id == "fmt " && off + 8 + 16 <= p.length) {
        if (le16(o + 8) != 1) return None // compressed WAV: not our seam
        ch = le16(o + 10)
        rate = le32(o + 12)
        bits = le16(o + 22)
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = math.min(sz, p.length - dataOff)
      }
      off += 8 + sz + (sz & 1)
    }
    if (rate <= 0 || ch <= 0 || bits != 16 || dataOff < 0) return None
    val n = dataLen / (2L * ch)
    if (n > MaxSamples) return None
    val out = new Array[Int](n.toInt)
    var i = 0
    while (i < out.length) {
      var s = 0
      var c = 0
      while (c < ch) {
        val v = le16((dataOff + (i.toLong * ch + c) * 2).toInt)
        s += (if (v >= 0x8000) v - 0x10000 else v)
        c += 1
      }
      out(i) = s / ch
      i += 1
    }
    Some((rate.toInt, out))
  }

  /** The audio half of the codec seam ([[gridOrStub]]'s rule): real WAV
    * bytes decode for real; anything else falls back to
    * [[Multimodal.StubCodec.audioSamples]]' md5-derived waveform, which
    * keeps text-corpus audio queries deterministic and DuckDB-replayable.
    */
  def samplesOrStub(payload: Array[Byte]): Array[Int] =
    decodePcmWav(payload) match {
      case Some((_, s)) => s
      case None         => Multimodal.StubCodec.audioSamples(payload)
    }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t'

  private def looksImageIo(p: Array[Byte]): Boolean =
    ((p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 'B' && p(1) == 'M') ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8')

  /** Binary PNM: "P5"/"P6", whitespace/#-comment-separated ASCII
    * width/height/maxval, ONE whitespace byte, then the raw raster.
    * maxval must be <= 255 (1 byte/sample) and the raster length must
    * match the header EXACTLY — a text payload that merely starts with
    * "P6 " can never satisfy that, so false positives cannot decode.
    * Samples are rescaled to the full 0-255 range when maxval < 255
    * (round(v·255/mx)) — a legal maxval-15 PGM must not decode near-black.
    */
  private def decodePnm(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    val color = p(1) == '6'
    var i = 2
    def nextInt(): Long = {
      var skipping = true
      while (skipping && i < p.length) {
        if (isSpace(p(i))) i += 1
        else if (p(i) == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else skipping = false
      }
      val st = i
      var v = 0L
      while (i < p.length && p(i) >= '0' && p(i) <= '9' && v <= MaxPixels) {
        v = v * 10 + (p(i) - '0'); i += 1
      }
      if (i == st) -1L else v
    }
    val w = nextInt(); val h = nextInt(); val mx = nextInt()
    if (w <= 0 || h <= 0 || mx <= 0 || mx > 255 || w * h > MaxPixels)
      return None
    if (i >= p.length || !isSpace(p(i))) return None
    i += 1
    val ch = if (color) 3 else 1
    val n = (w * h).toInt
    if (p.length - i != w * h * ch) return None
    val out = new Array[Int](n)
    val m = mx.toInt
    // rescale a 0..mx sample to 0..255 (identity when mx == 255);
    // out-of-gamut samples (raw byte > declared maxval) clamp to white
    def full(v: Int): Int =
      if (m == 255) v else math.min(255, (v * 255 + m / 2) / m)
    var k = 0
    while (k < n) {
      out(k) =
        if (color) {
          val r = full(p(i + 3 * k) & 0xff)
          val g = full(p(i + 3 * k + 1) & 0xff)
          val b = full(p(i + 3 * k + 2) & 0xff)
          (299 * r + 587 * g + 114 * b + 500) / 1000
        } else full(p(i + k) & 0xff)
      k += 1
    }
    Some((w.toInt, h.toInt, out))
  }

  private def decodeImageIo(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(p)))
        .flatMap { img =>
          val w = img.getWidth; val h = img.getHeight
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) None
          else {
            val out = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val r = (rgb >> 16) & 0xff
                val g = (rgb >> 8) & 0xff
                val b = rgb & 0xff
                out(y * w + x) = (299 * r + 587 * g + 114 * b + 500) / 1000
                x += 1
              }
              y += 1
            }
            Some((w, h, out))
          }
        }
    } catch { case _: Exception => None }
}
