package graft.multimodal

/** Real JPEG luma decode — the second pixel tier under the F8
  * perceptual hash (round 11, verdict #6): real corpora are mostly
  * JPEG, and [[PngCodec.phash]]'s pipeline needs only a luma source,
  * so this decoder feeds it the Y plane straight out of the entropy
  * stream (no chroma upsampling, no color conversion — BT.601 luma IS
  * the Y component). Everything here is plain JVM byte work from the
  * public JPEG spec (ITU-T T.81): marker walk (DQT/DHT/SOF/DRI/SOS),
  * canonical Huffman tables (spec C.2), the RRRRSSSS run-length AC
  * coding with EXTEND sign recovery (spec F.2.2.1), byte-unstuffing
  * (0xFF00) and restart-marker handling, dequantize → de-zigzag →
  * separable 2-D IDCT per 8×8 block.
  *
  * Coverage: baseline and extended-sequential Huffman scans
  * (SOF0/SOF1) AND progressive Huffman (SOF2, since late round 11 —
  * spectral-selection + successive-approximation per T.81 annex G:
  * DC first/refine passes, AC first passes with EOB runs, AC
  * refinement with correction bits; luma coefficients accumulate
  * across scans in one MCU-padded plane, chroma-only AC scans are
  * skipped at the byte level, interleaved DC scans Huffman-decode
  * chroma to keep stream position). 8-bit samples, 1–3 components
  * with the luma component at full resolution (h = hmax, v = vmax —
  * true of every libjpeg/ImageIO encoding). Arithmetic coding,
  * 12-bit, hierarchical, and >3-component (CMYK) files return None
  * and the caller falls back to the byte-arithmetic stub — the same
  * graceful-fallback contract as [[PngCodec.decodeLuma]].
  *
  * Determinism: Huffman/dequant are exact integer work; the IDCT uses
  * a StrictMath.cos basis table, so decoded luma is bit-identical on
  * any JVM/platform (the PngCodec determinism argument, applied to
  * T.81 — a conformant-but-different integer IDCT would be ±1 off,
  * which is why the spec compares pHashes against an independent
  * decoder rather than raw pixels). The gate never sees this arm: a
  * JPEG signature (lead byte 0xFF) has no UTF-8 encoding, so the
  * registered queries' document-derived payloads can never reach it
  * and the DuckDB oracles stay byte-for-byte unchanged (the
  * decodeHeader oracle-reachability argument, Multimodal.scala).
  * JpegCodecSpec pins the tier on ImageIO-encoded fixtures instead:
  * quality re-encodes hash identically where the stub provably
  * cannot, and dimensions agree with decodeHeader's marker parse.
  */
object JpegCodec {

  /** Zigzag scan order (T.81 figure 5): index i in the stream lands at
    * natural (row-major) position ZigZag(i) of the 8×8 block.
    */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) basis, StrictMath for cross-platform
    * bit-equality; col u=0 pre-scaled by 1/√2 (the C(u) factor).
    */
  private val CosT: Array[Double] = {
    val t = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var u = 0
      while (u < 8) {
        val c = StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16)
        t(x * 8 + u) = if (u == 0) c / StrictMath.sqrt(2.0) else c
        u += 1
      }
      x += 1
    }
    t
  }

  /** Canonical Huffman table (T.81 annex C): 16 code-length counts +
    * symbols in code order → flat (length, code) → symbol lookup.
    * Decoding walks bit by bit, extending the code and checking the
    * per-length window — max 16 steps, no tree allocation.
    */
  private final class Huff(counts: Array[Int], symbols: Array[Byte]) {
    // minCode(l), maxCode(l) (exclusive), valPtr(l): spec F.2.2.3
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = code // exclusive upper bound at this length
        code <<= 1
        l += 1
      }
    }
    def decode(in: BitReader): Int = {
      var code = 0
      var l = 0
      while (l < 16) {
        code = (code << 1) | in.bit()
        l += 1
        if (code < maxCode(l))
          return symbols(valPtr(l) + (code - minCode(l))) & 0xff
      }
      throw new MatchError("huffman code over 16 bits")
    }
  }

  /** MSB-first bit reader over the entropy-coded segment: unstuffs
    * 0xFF00 and aborts the decode (MatchError → None at the API
    * boundary) if a bit fill ever reaches a real marker — a
    * well-formed scan consumes exactly its encoded bits, so the
    * reader only ever sees markers on a malformed/truncated stream.
    */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length)
          throw new MatchError("bit read past end")
        var byte = b(pos) & 0xff
        pos += 1
        if (byte == 0xff) {
          if (pos >= b.length) throw new MatchError("truncated stream")
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed 0xFF data byte
          else throw new MatchError("marker inside bit fill")
        }
        acc = byte
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker (a well-formed
      * scan reaches each RSTn byte-aligned, never through a bit fill).
      */
    def restart(): Boolean = {
      nbits = 0
      if (pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
          (b(pos + 1) & 0xff) >= 0xd0 && (b(pos + 1) & 0xff) <= 0xd7) {
        pos += 2
        true
      } else false
    }
  }

  /** EXTEND (spec F.2.2.1): an s-bit magnitude with a 0 lead bit is
    * the negative value v − (2^s − 1).
    */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var td = 0 // DC table id (from SOS)
    var ta = 0 // AC table id
    var pred = 0 // DC predictor
  }

  /** Decode a baseline JPEG payload to 8-bit luma; None when the
    * bytes are not a JPEG this tier covers (the caller then uses the
    * stub). Never throws on arbitrary bytes. Allocation is bounded up
    * front (the same 2^26-pixel budget as [[PngCodec.decodeLuma]],
    * checked before any plane is sized), so a crafted header claiming
    * huge dimensions is rejected rather than attempted — no
    * OutOfMemoryError is ever provoked or caught here: catching OOME
    * in an executor task can mask allocation failures raised in
    * sibling threads and leave the JVM degraded.
    */
  def decodeLuma(bytes: Array[Byte]): Option[PngCodec.Luma] =
    try decode0(bytes) catch { case _: MatchError |
      _: ArrayIndexOutOfBoundsException | _: NegativeArraySizeException =>
      None }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 8) | u8(b, i + 1)

  /** Skip an entropy-coded segment at the byte level (a scan whose
    * component we don't need): returns the index of the first 0xFF of
    * the next REAL marker (stuffed 0xFF00 and RSTn pass through).
    */
  private def skipScan(b: Array[Byte], start: Int): Int = {
    var p = start
    while (p + 1 < b.length) {
      if (u8(b, p) == 0xff) {
        val m = u8(b, p + 1)
        if (m != 0x00 && !(m >= 0xd0 && m <= 0xd7)) return p
        p += 2
      } else p += 1
    }
    b.length
  }

  private def decode0(b: Array[Byte]): Option[PngCodec.Luma] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    val qt = Array.ofDim[Int](4, 64) // natural order after de-zigzag
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var comps: Array[Comp] = null
    var w = 0
    var h = 0
    var ri = 0 // restart interval in MCUs
    var progressive = false
    var yCoef: Array[Int] = null // progressive: Y coefficient plane
    var yBw = 0 // Y block grid, MCU-padded
    var yBh = 0
    var yDecoded = false
    var pos = 2
    var sosAt = -1
    while (sosAt < 0) {
      if (pos + 1 >= b.length) return None
      if (u8(b, pos) != 0xff) return None
      val m = u8(b, pos + 1)
      if (m == 0xff) pos += 1 // fill byte before a marker (T.81 B.1.1.2)
      else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) pos += 2
      else if (m == 0xd9) { // EOI
        // progressive: the accumulated plane is the result
        if (!progressive || !yDecoded) return None
        return Some(finishProgressive(
          yCoef, yBw, yBh, w, h, qt(comps(0).tq)))
      }
      else {
        if (pos + 3 >= b.length) return None
        val len = be16(b, pos + 2)
        if (len < 2 || pos + 2 + len > b.length) return None
        val seg = pos + 4
        m match {
          case 0xdb => // DQT: one or more tables
            var p = seg
            while (p < pos + 2 + len) {
              val pq = u8(b, p) >> 4
              val tq = u8(b, p) & 15
              if (tq > 3 || pq > 1) return None
              var i = 0
              p += 1
              while (i < 64) {
                qt(tq)(ZigZag(i)) =
                  if (pq == 0) u8(b, p) else be16(b, p)
                p += (if (pq == 0) 1 else 2)
                i += 1
              }
            }
          case 0xc4 => // DHT: one or more tables
            var p = seg
            while (p < pos + 2 + len) {
              val tc = u8(b, p) >> 4
              val th = u8(b, p) & 15
              if (tc > 1 || th > 3) return None
              val counts = (1 to 16).map(i => u8(b, p + i)).toArray
              val n = counts.sum
              val syms = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + n)
              val t = new Huff(counts, syms)
              if (tc == 0) dcT(th) = t else acT(th) = t
              p += 17 + n
            }
          case 0xc0 | 0xc1 | 0xc2 => // sequential / progressive frame
            if (u8(b, seg) != 8) return None // 8-bit samples only
            progressive = m == 0xc2
            h = be16(b, seg + 1)
            w = be16(b, seg + 3)
            val nc = u8(b, seg + 5)
            if (w <= 0 || h <= 0 || nc < 1 || nc > 3) return None
            if (w.toLong * h > (1L << 26)) return None // 64 MPix bound
            comps = (0 until nc).map { i =>
              val o = seg + 6 + 3 * i
              Comp(u8(b, o), u8(b, o + 1) >> 4, u8(b, o + 1) & 15,
                u8(b, o + 2))
            }.toArray
            if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 ||
                c.v > 4 || c.tq > 3)) return None
            if (progressive) {
              val hMax = comps.map(_.h).max
              val vMax = comps.map(_.v).max
              val y = comps(0)
              if (y.h != hMax || y.v != vMax) return None
              yBw = ((w + 8 * hMax - 1) / (8 * hMax)) * y.h
              yBh = ((h + 8 * vMax - 1) / (8 * vMax)) * y.v
              // The 64 MPix frame bound already holds, so the MCU-
              // padded block grid is ≤ 2^20 + (w+h)/2 + 16 blocks
              // (padding ≤ hMax/vMax−1 per axis); the explicit cap
              // keeps yCoef ≤ ~272 MB even against a doctored header.
              if (yBw.toLong * yBh > (1L << 20) + (1L << 16)) return None
              yCoef = new Array[Int](yBw * yBh * 64)
            }
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
              0xcd | 0xce | 0xcf =>
            return None // lossless / arithmetic / hierarchical
          case 0xdd => ri = be16(b, seg)
          case 0xda => // SOS
            if (comps == null) return None
            val ns = u8(b, seg)
            if (ns < 1 || ns > comps.length) return None
            val scanComps = (0 until ns).map { i =>
              val cs = u8(b, seg + 1 + 2 * i)
              val c = comps.find(_.id == cs).getOrElse(return None)
              c.td = u8(b, seg + 2 + 2 * i) >> 4
              c.ta = u8(b, seg + 2 + 2 * i) & 15
              c
            }.toArray
            if (!progressive) {
              if (ns != comps.length) return None
              sosAt = pos + 2 + len
            } else {
              val ss = u8(b, seg + 1 + 2 * ns)
              val se = u8(b, seg + 2 + 2 * ns)
              val ah = u8(b, seg + 3 + 2 * ns) >> 4
              val al = u8(b, seg + 3 + 2 * ns) & 15
              if (ss > 63 || se > 63 || se < ss || al > 13) return None
              val dataAt = pos + 2 + len
              val isDc = ss == 0
              if (isDc && se != 0) return None // DC scans are 0..0
              if (!isDc && ns != 1) return None // AC scans: one comp
              if (!isDc && scanComps(0).id != comps(0).id) {
                // chroma-only AC scan: skip at the byte level
                pos = skipScan(b, dataAt)
              } else {
                val in = new BitReader(b, dataAt)
                if (isDc)
                  decodeProgDc(in, scanComps, comps, yCoef, yBw,
                    w, h, ri, ah, al, dcT)
                else
                  decodeProgAc(in, comps(0), yCoef, yBw, w, h, ri,
                    ss, se, ah, al, acT)
                yDecoded = true
                // the reader never consumed a marker (bit() aborts the
                // decode if a fill ever reaches one), so it stopped at
                // or before the next marker's 0xFF
                pos = in.pos
              }
            }
          case _ => () // APPn / COM / others: skip
        }
        if (m != 0xda || !progressive) pos += 2 + len
      }
    }
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val y = comps(0) // luma is the first component per T.81 convention
    if (y.h != hMax || y.v != vMax) return None // Y must be full-res
    if (dcT(y.td) == null || acT(y.ta) == null) return None
    comps.foreach { c =>
      if (dcT(c.td) == null || acT(c.ta) == null) return None
    }
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val px = new Array[Int](w * h)
    val in = new BitReader(b, sosAt)
    val coef = new Array[Int](64)
    val blk = new Array[Int](64)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (ri > 0 && mcu > 0 && mcu % ri == 0) {
          if (!in.restart()) return None
          comps.foreach(_.pred = 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val isY = ci == 0
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              // Huffman-decode one block (always, to advance the
              // stream); dequantize/IDCT only the luma blocks
              java.util.Arrays.fill(coef, 0)
              val sDc = dcT(c.td).decode(in)
              if (sDc > 15) return None
              c.pred += extend(in.bits(sDc), sDc)
              coef(0) = c.pred * qt(c.tq)(0)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = acT(c.ta).decode(in)
                val r = rs >> 4
                val s = rs & 15
                if (s == 0) {
                  if (r == 15) k += 16 // ZRL: 16 zeros
                  else eob = true
                } else {
                  k += r
                  if (k > 63) return None
                  coef(ZigZag(k)) = extend(in.bits(s), s) * qt(c.tq)(ZigZag(k))
                  k += 1
                }
              }
              if (isY) {
                idct8(coef, blk)
                // place the block: Y is full-res, so block (by, bx)
                // of MCU (my, mx) covers an aligned 8×8 pixel tile
                val py0 = (my * c.v + by) * 8
                val px0 = (mx * c.h + bx) * 8
                var yy = 0
                while (yy < 8 && py0 + yy < h) {
                  var xx = 0
                  while (xx < 8 && px0 + xx < w) {
                    px((py0 + yy) * w + px0 + xx) = blk(yy * 8 + xx)
                    xx += 1
                  }
                  yy += 1
                }
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    Some(PngCodec.Luma(w, h, px))
  }

  /** Progressive DC scan (T.81 G.1.2.1): first pass (Ah=0) decodes
    * the usual DC differences shifted left by Al; refinement passes
    * (Ah>0) read ONE correction bit per block. Interleaved when the
    * scan lists several components (MCU order, chroma decoded to keep
    * stream position, discarded); non-interleaved block raster when it
    * lists one. Restart markers reset predictors on interval bounds.
    */
  private def decodeProgDc(in: BitReader, scanComps: Array[Comp],
      comps: Array[Comp], yCoef: Array[Int], yBw: Int, w: Int, h: Int,
      ri: Int, ah: Int, al: Int, dcT: Array[Huff]): Unit = {
    scanComps.foreach(_.pred = 0)
    if (ah == 0) scanComps.foreach { c =>
      if (dcT(c.td) == null) throw new MatchError("missing DC table")
    }
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    def one(c: Comp, isY: Boolean, bi: Int): Unit = {
      if (ah == 0) {
        val s = dcT(c.td).decode(in)
        if (s > 15) throw new MatchError("DC magnitude over 15")
        c.pred += extend(in.bits(s), s)
        if (isY) yCoef(bi * 64) = c.pred << al
      } else {
        val bit = in.bit()
        if (isY && bit == 1) yCoef(bi * 64) |= 1 << al
      }
    }
    if (scanComps.length > 1) { // interleaved MCU order
      val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
      var mcu = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (ri > 0 && mcu > 0 && mcu % ri == 0) {
            if (!in.restart()) throw new MatchError("missing RST")
            scanComps.foreach(_.pred = 0)
          }
          var ci = 0
          while (ci < scanComps.length) {
            val c = scanComps(ci)
            val isY = c.id == comps(0).id
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                one(c, isY,
                  (my * c.v + by) * yBw + mx * c.h + bx)
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    } else { // single component: its own block raster, no MCU padding
      val c = scanComps(0)
      val isY = c.id == comps(0).id
      val cw = (w * c.h + 8 * hMax - 1) / (8 * hMax) // blocks wide
      val ch = (h * c.v + 8 * vMax - 1) / (8 * vMax)
      var blk = 0
      var by = 0
      while (by < ch) {
        var bx = 0
        while (bx < cw) {
          if (ri > 0 && blk > 0 && blk % ri == 0) {
            if (!in.restart()) throw new MatchError("missing RST")
            c.pred = 0
          }
          one(c, isY, by * yBw + bx)
          blk += 1
          bx += 1
        }
        by += 1
      }
    }
  }

  /** Progressive AC scan for the LUMA component (T.81 G.1.2.2–3):
    * first pass (Ah=0) is run-length RRRRSSSS with EOB-run codes and
    * values shifted by Al; refinement (Ah>0) is libjpeg's
    * decode_mcu_AC_refine shape — correction bits for already-nonzero
    * coefficients, ±(1<<Al) insertions with a sign bit, EOB runs that
    * still consume correction bits over the remaining band.
    */
  private def decodeProgAc(in: BitReader, y: Comp, yCoef: Array[Int],
      yBw: Int, w: Int, h: Int, ri: Int, ss: Int, se: Int, ah: Int,
      al: Int, acT: Array[Huff]): Unit = {
    if (acT(y.ta) == null) throw new MatchError("missing AC table")
    val huff = acT(y.ta)
    val cw = (w + 7) / 8 // Y is full-res: its grid is ceil(w/8)
    val ch = (h + 7) / 8
    val p1 = 1 << al
    val m1 = -1 << al
    var eobrun = 0
    var blk = 0
    var by = 0
    while (by < ch) {
      var bx = 0
      while (bx < cw) {
        if (ri > 0 && blk > 0 && blk % ri == 0) {
          if (!in.restart()) throw new MatchError("missing RST")
          eobrun = 0
        }
        val base = (by * yBw + bx) * 64
        if (ah == 0) { // first pass over this band
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            while (k <= se) {
              val rs = huff.decode(in)
              val r = rs >> 4
              val s = rs & 15
              if (s == 0) {
                if (r == 15) k += 16 // ZRL
                else {
                  eobrun = (1 << r) - 1
                  if (r > 0) eobrun += in.bits(r)
                  k = se + 1
                }
              } else {
                k += r
                if (k > se) throw new MatchError("AC run past band")
                yCoef(base + ZigZag(k)) = extend(in.bits(s), s) << al
                k += 1
              }
            }
          }
        } else { // refinement pass (libjpeg decode_mcu_AC_refine)
          var k = ss
          if (eobrun == 0) {
            var done = false
            while (k <= se && !done) {
              val rs = huff.decode(in)
              var r = rs >> 4
              val s = rs & 15
              var ins = 0
              if (s == 0) {
                if (r != 15) {
                  eobrun = 1 << r
                  if (r > 0) eobrun += in.bits(r)
                  done = true
                }
              } else {
                if (s != 1) throw new MatchError("refine s != 1")
                ins = if (in.bit() == 1) p1 else m1
              }
              if (!done) {
                var placed = false
                while (k <= se && !placed) {
                  val idx = base + ZigZag(k)
                  if (yCoef(idx) != 0) {
                    if (in.bit() == 1 && (yCoef(idx) & p1) == 0)
                      yCoef(idx) +=
                        (if (yCoef(idx) >= 0) p1 else m1)
                    k += 1
                  } else {
                    r -= 1
                    if (r < 0) {
                      if (ins != 0) yCoef(idx) = ins
                      k += 1
                      placed = true
                    } else k += 1
                  }
                }
              }
            }
          }
          if (eobrun > 0) { // correction bits across the rest of band
            while (k <= se) {
              val idx = base + ZigZag(k)
              if (yCoef(idx) != 0) {
                if (in.bit() == 1 && (yCoef(idx) & p1) == 0)
                  yCoef(idx) += (if (yCoef(idx) >= 0) p1 else m1)
              }
              k += 1
            }
            eobrun -= 1
          }
        }
        blk += 1
        bx += 1
      }
      by += 1
    }
  }

  /** Dequantize + IDCT the accumulated progressive Y plane. */
  private def finishProgressive(yCoef: Array[Int], yBw: Int, yBh: Int,
      w: Int, h: Int, q: Array[Int]): PngCodec.Luma = {
    val px = new Array[Int](w * h)
    val dq = new Array[Int](64)
    val blk = new Array[Int](64)
    var by = 0
    while (by < yBh) {
      var bx = 0
      while (bx < yBw) {
        val base = (by * yBw + bx) * 64
        var j = 0
        while (j < 64) { dq(j) = yCoef(base + j) * q(j); j += 1 }
        idct8(dq, blk)
        val py0 = by * 8
        val px0 = bx * 8
        var yy = 0
        while (yy < 8 && py0 + yy < h) {
          var xx = 0
          while (xx < 8 && px0 + xx < w) {
            px((py0 + yy) * w + px0 + xx) = blk(yy * 8 + xx)
            xx += 1
          }
          yy += 1
        }
        bx += 1
      }
      by += 1
    }
    PngCodec.Luma(w, h, px)
  }

  /** Separable 8×8 inverse DCT (T.81 A.3.3) + level shift + clamp:
    * rows first (u over CosT), then columns, ×1/4, +128, [0, 255].
    */
  private def idct8(coef: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // rows of the coefficient block: IDCT over u
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          val f = coef(v * 8 + u)
          if (f != 0) s += f * CosT(x * 8 + u)
          u += 1
        }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) { // columns: IDCT over v (CosT col 0 carries 1/√2)
      var x = 0
      while (x < 8) {
        var s = 0.0
        var vv = 0
        while (vv < 8) {
          s += tmp(vv * 8 + x) * CosT(y * 8 + vv)
          vv += 1
        }
        val p = StrictMath.round(s / 4.0 + 128.0).toInt
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }
}
