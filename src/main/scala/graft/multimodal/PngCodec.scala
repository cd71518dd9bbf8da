package graft.multimodal

import java.util.zip.Inflater

/** Real PNG pixel decode + perceptual hash — the pixel tier below
  * [[Multimodal.decodeHeader]]'s (already-real) header parse, closing
  * the one declared stub layer for ONE format end-to-end. Everything
  * here is plain JVM byte work from the public PNG spec (RFC 2083 /
  * ISO 15948): IDAT is zlib (`java.util.zip.Inflater`), scanlines
  * carry one of 5 filter types, and the pHash is the standard
  * 32×32-luma → DCT-II → low-frequency 8×8 → median-threshold
  * signature (pHash.org's published construction).
  *
  * Coverage: 8-bit depth, color types 0/2/3/4/6 (gray, RGB, palette,
  * gray+alpha, RGBA), non-interlaced. Anything else (16-bit, Adam7)
  * returns None and the caller falls back to the byte-arithmetic stub
  * — the same graceful-fallback contract the header parse uses.
  *
  * Determinism: luma is exact integer BT.601 ((77R + 150G + 29B) >>
  * 8); the DCT uses StrictMath.cos so the signature is bit-identical
  * on any JVM/platform; the median is the sorted 63-element midpoint
  * (index 31), no averaging. The gate never sees this arm — a PNG
  * signature (lead byte 0x89) is unrepresentable in the UTF-8
  * payloads the registered queries derive from the documents table,
  * which is exactly why the DuckDB oracles stay byte-for-byte
  * unchanged (the decodeHeader oracle-reachability argument,
  * Multimodal.scala) — so PngCodecSpec pins this tier on handcrafted
  * PNGs instead: filter-type round-trips, and re-encoded pixels
  * hashing identically where the byte-level stub provably cannot.
  */
object PngCodec {

  /** A decoded image: dimensions + row-major 0..255 luma. */
  case class Luma(width: Int, height: Int, px: Array[Int])

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) |
      u8(b, i + 3)

  /** Channels per pixel for each supported color type. */
  private def channels(colorType: Int): Int = colorType match {
    case 0 => 1 // gray
    case 2 => 3 // rgb
    case 3 => 1 // palette index
    case 4 => 2 // gray + alpha
    case 6 => 4 // rgba
    case _ => -1
  }

  /** Paeth predictor (PNG spec §6.6). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Decode a PNG payload to 8-bit luma; None when the bytes are not
    * a PNG this tier covers (the caller then uses the stub).
    */
  def decodeLuma(bytes: Array[Byte]): Option[Luma] = {
    if (bytes.length < 45 ||
      !bytes.take(8).sameElements(Multimodal.PngSig)) return None
    // one chunk walk: IHDR geometry, PLTE palette, concatenated IDAT
    var w = 0; var h = 0; var depth = 0; var ct = -1; var interlace = 0
    var palette: Array[Int] = null
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8
    var sawEnd = false
    while (!sawEnd && pos + 8 <= bytes.length) {
      val len = be32(bytes, pos)
      if (len < 0 || pos + 12L + len > bytes.length) return None
      val typ = new String(bytes, pos + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = be32(bytes, pos + 8); h = be32(bytes, pos + 12)
          depth = u8(bytes, pos + 16); ct = u8(bytes, pos + 17)
          interlace = u8(bytes, pos + 20)
        case "PLTE" =>
          palette = Array.tabulate(len / 3) { i =>
            (u8(bytes, pos + 8 + 3 * i) << 16) |
              (u8(bytes, pos + 9 + 3 * i) << 8) |
              u8(bytes, pos + 10 + 3 * i)
          }
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunks skipped
      }
      pos += 12 + len
    }
    val ch = channels(ct)
    if (!sawEnd || w <= 0 || h <= 0 || depth != 8 || ch < 0 ||
      interlace != 0 || (ct == 3 && palette == null)) return None
    if (w.toLong * h > (1L << 26)) return None // 64 MPix decode bound
    // zlib-inflate the scanline stream: h rows of (1 filter byte +
    // w·ch samples)
    val stride = w * ch
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated
        got += n
      }
      if (got < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // defilter in place into `img` (unfiltered samples, row-major)
    val img = new Array[Int](stride * h)
    var y = 0
    while (y < h) {
      val f = u8(raw, y * (stride + 1))
      val ro = y * (stride + 1) + 1
      val o = y * stride
      var x = 0
      while (x < stride) {
        val cur = u8(raw, ro + x)
        val left = if (x >= ch) img(o + x - ch) else 0
        val up = if (y > 0) img(o + x - stride) else 0
        val ul = if (y > 0 && x >= ch) img(o + x - stride - ch) else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + ((left + up) >> 1)
          case 4 => cur + paeth(left, up, ul)
          case _ => return None
        }
        img(o + x) = v & 0xff
        x += 1
      }
      y += 1
    }
    // luma: exact integer BT.601 on the recovered channels
    val px = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val o = i * ch
      px(i) = ct match {
        case 0 | 4 => img(o)
        case 2 | 6 =>
          (77 * img(o) + 150 * img(o + 1) + 29 * img(o + 2)) >> 8
        case 3 =>
          val rgb = palette(img(o) & 0xff)
          (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
            29 * (rgb & 0xff)) >> 8
      }
      i += 1
    }
    Some(Luma(w, h, px))
  }

  /** The published pHash construction over decoded luma: box-average
    * to 32×32, 2-D DCT-II, keep the low-frequency 8×8 block, bit u·8+v
    * set iff its coefficient exceeds the median of the 63 non-DC
    * coefficients. Bits 0 (DC) AND 63 (the highest-frequency corner,
    * the least perceptually informative of the 64) are held at 0, so
    * the code is a genuine non-negative 62-entropy-bit Long — the same
    * signed-arithmetic-safe contract as the stub's 63-bit pack, which
    * keeps an exact integer replay (banding, modular bucketing) open
    * to any engine without unsigned types.
    */
  def phash(l: Luma): Long = {
    val N = 32
    val g = new Array[Double](N * N)
    var j = 0
    while (j < N) {
      val r0 = j * l.height / N
      val r1 = math.min(l.height, math.max((j + 1) * l.height / N, r0 + 1))
      var i = 0
      while (i < N) {
        val c0 = i * l.width / N
        val c1 = math.min(l.width, math.max((i + 1) * l.width / N, c0 + 1))
        var s = 0L; var cnt = 0
        var y = r0
        while (y < r1) {
          var x = c0
          while (x < c1) { s += l.px(y * l.width + x); cnt += 1; x += 1 }
          y += 1
        }
        g(j * N + i) = s.toDouble / cnt
        i += 1
      }
      j += 1
    }
    // low 8×8 of the 32-point DCT-II, separably
    val K = 8
    val rows = new Array[Double](N * K) // DCT over x for each row
    j = 0
    while (j < N) {
      var u = 0
      while (u < K) {
        var s = 0.0
        var x = 0
        while (x < N) {
          s += g(j * N + x) *
            StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2 * N))
          x += 1
        }
        rows(j * K + u) = s
        u += 1
      }
      j += 1
    }
    val coef = new Array[Double](K * K)
    var v = 0
    while (v < K) {
      var u = 0
      while (u < K) {
        var s = 0.0
        var y = 0
        while (y < N) {
          s += rows(y * K + u) *
            StrictMath.cos((2 * y + 1) * v * StrictMath.PI / (2 * N))
          y += 1
        }
        coef(v * K + u) = s
        u += 1
      }
      v += 1
    }
    val ac = coef.drop(1).sorted
    val med = ac(31) // 63 non-DC coefficients, exact midpoint
    var hsh = 0L
    var b = 1
    while (b < K * K - 1) { // bit 63 stays 0: keeps the Long sign bit clear
      if (coef(b) > med) hsh |= 1L << b
      b += 1
    }
    hsh
  }

  /** The F8 hash with the real tiers in front: DCT pHash for
    * decodable PNGs, baseline JPEGs ([[JpegCodec]]) and GIFs
    * ([[GifCodec]], r15 — behind its UTF-8 oracle-reachability gate)
    * — same luma contract, same pHash pipeline, so a PNG, a JPEG and
    * a GIF encoding of the same pixels band together — and the
    * byte-arithmetic stub for everything else.
    */
  def phashOf(bytes: Array[Byte]): Long =
    decodeLuma(bytes).orElse(JpegCodec.decodeLuma(bytes))
      .orElse(GifCodec.decodeLuma(bytes))
      .map(phash).getOrElse(Multimodal.phashStub(bytes))
}
