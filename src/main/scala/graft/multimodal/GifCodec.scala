package graft.multimodal

/** Real GIF pixel decode — the pixel tier below
  * [[Multimodal.decodeHeader]]'s (already-real) GIF header arm,
  * closing the last stubbed image format in the F8 pHash family
  * (r14 verdict task 5; PNG and baseline JPEG already band on real
  * pixels). Everything is dependency-free byte work from the public
  * GIF89a specification: logical-screen descriptor + color tables,
  * extension-block skip, the first image descriptor, GIF-variant LZW
  * (LSB-first variable-width codes, CLEAR/EOI, 12-bit dictionary
  * cap), Adam-style 4-pass interlace reorder, and palette lookup to
  * the shared exact-integer BT.601 luma contract
  * ([[PngCodec.Luma]] — same formula, same pHash pipeline, so a GIF
  * and a PNG encoding of the same pixels band together).
  *
  * Oracle-reachability gate: unlike PNG (0x89) and JPEG (0xFF), every
  * byte of a conceivable GIF can be valid UTF-8 — "GIF89a" is plain
  * ASCII — so a REAL pixel arm keyed on structure alone could in
  * principle fire on a documents-table payload and diverge from the
  * stub-replaying DuckDB oracle (mirroring an LZW decoder in SQL is
  * not an option). The arm therefore refuses any payload that decodes
  * as well-formed UTF-8: documents-table payloads ARE well-formed
  * UTF-8 by construction (they come from a string column), so on
  * every oracled table this arm provably never fires and the oracle
  * stays byte-for-byte unchanged — the decodeHeader reachability
  * argument, made explicit as a gate. The price: a degenerate GIF
  * whose every byte happens to form valid UTF-8 (possible only for
  * near-trivial images with low-byte palettes) takes the stub arm;
  * real-world GIFs carry high bytes in palettes/LZW data and decode
  * here. GifCodecSpec pins fidelity against the JDK's ImageIO decoder
  * and the re-encode-bands-together property the stub provably lacks.
  */
object GifCodec {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)

  /** Well-formed-UTF-8 check backing the oracle-reachability gate. */
  private[multimodal] def isValidUtf8(bytes: Array[Byte]): Boolean = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(bytes)); true }
    catch { case _: java.nio.charset.CharacterCodingException => false }
  }

  /** GIF-variant LZW: LSB-first codes growing from `minCode`+1 to 12
    * bits, CLEAR resets the dictionary, EOI ends the stream; emits at
    * most `maxPixels` indices. None on any malformed stream.
    */
  private def lzwDecode(data: Array[Byte], minCode: Int,
      maxPixels: Int): Option[Array[Byte]] = {
    if (minCode < 2 || minCode > 8) return None
    val clear = 1 << minCode
    val eoi = clear + 1
    val MaxCodes = 4096
    val prefix = new Array[Int](MaxCodes)
    val suffix = new Array[Byte](MaxCodes)
    val stack = new Array[Byte](MaxCodes + 1)
    val out = new java.io.ByteArrayOutputStream(maxPixels)
    var codeSize = minCode + 1
    var next = eoi + 1
    var prev = -1
    var bitPos = 0
    val nBits = data.length * 8
    def readCode(): Int = {
      if (bitPos + codeSize > nBits) return -1
      var v = 0
      var i = 0
      while (i < codeSize) {
        val p = bitPos + i
        if (((data(p >> 3) >> (p & 7)) & 1) != 0) v |= 1 << i
        i += 1
      }
      bitPos += codeSize
      v
    }
    // writes code's string, returns its first index byte
    def emit(code: Int): Byte = {
      var sp = 0
      var c = code
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      val first = c.toByte
      out.write(first)
      while (sp > 0) { sp -= 1; out.write(stack(sp)) }
      first
    }
    var done = false
    while (!done && out.size < maxPixels) {
      val code = readCode()
      if (code < 0) return None // truncated stream
      else if (code == clear) {
        codeSize = minCode + 1; next = eoi + 1; prev = -1
      } else if (code == eoi) done = true
      else if (prev == -1) {
        if (code >= clear) return None // first code must be a literal
        emit(code)
        prev = code
      } else {
        val first =
          if (code < next) emit(code)
          else if (code == next) { // the KwKwK case
            var c = prev
            while (c >= clear) c = prefix(c)
            emit(prev)
            out.write(c)
            c.toByte
          } else return None // code beyond the dictionary
        if (next < MaxCodes) {
          prefix(next) = prev; suffix(next) = first
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    if (out.size < maxPixels) None // frame under-filled
    else Some(out.toByteArray.take(maxPixels))
  }

  /** Interlaced GIFs store rows in 4 passes (8/8 from 0, 8/8 from 4,
    * 4/4 from 2, 2/2 from 1); maps decoded row order → display row.
    */
  private def interlaceRows(h: Int): Array[Int] = {
    val rows = new Array[Int](h)
    var r = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) { rows(r) = y; r += 1; y += step }
    }
    rows
  }

  /** Decode the first frame of a GIF payload to 8-bit luma; None when
    * the bytes are not a GIF this tier covers (the caller then falls
    * back — [[PngCodec.phashOf]]'s contract), or when the payload is
    * valid UTF-8 (the oracle-reachability gate above).
    */
  def decodeLuma(bytes: Array[Byte]): Option[PngCodec.Luma] = {
    if (bytes.length < 14) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    if (isValidUtf8(bytes)) return None // see the gate note above
    val gctFlag = (u8(bytes, 10) & 0x80) != 0
    val gctSize = 2 << (u8(bytes, 10) & 7)
    var pos = 13
    var globalPal: Array[Int] = null
    if (gctFlag) {
      if (pos + 3 * gctSize > bytes.length) return None
      globalPal = Array.tabulate(gctSize)(i =>
        (u8(bytes, pos + 3 * i) << 16) | (u8(bytes, pos + 3 * i + 1) << 8) |
          u8(bytes, pos + 3 * i + 2))
      pos += 3 * gctSize
    }
    while (pos < bytes.length) {
      u8(bytes, pos) match {
        case 0x21 => // extension: label, then sub-blocks until 0
          pos += 2
          var len = if (pos < bytes.length) u8(bytes, pos) else return None
          while (len != 0) {
            pos += 1 + len
            if (pos >= bytes.length) return None
            len = u8(bytes, pos)
          }
          pos += 1
        case 0x2c => // image descriptor — decode this first frame
          if (pos + 10 > bytes.length) return None
          val iw = le16(bytes, pos + 5)
          val ih = le16(bytes, pos + 7)
          val packed = u8(bytes, pos + 9)
          pos += 10
          if (iw <= 0 || ih <= 0 || iw.toLong * ih > (1L << 26)) return None
          val interlaced = (packed & 0x40) != 0
          var pal = globalPal
          if ((packed & 0x80) != 0) {
            val n = 2 << (packed & 7)
            if (pos + 3 * n > bytes.length) return None
            pal = Array.tabulate(n)(i =>
              (u8(bytes, pos + 3 * i) << 16) |
                (u8(bytes, pos + 3 * i + 1) << 8) | u8(bytes, pos + 3 * i + 2))
            pos += 3 * n
          }
          if (pal == null || pos >= bytes.length) return None
          val minCode = u8(bytes, pos)
          pos += 1
          val data = new java.io.ByteArrayOutputStream()
          var len = if (pos < bytes.length) u8(bytes, pos) else return None
          while (len != 0) {
            if (pos + 1 + len > bytes.length) return None
            data.write(bytes, pos + 1, len)
            pos += 1 + len
            if (pos >= bytes.length) return None
            len = u8(bytes, pos)
          }
          return lzwDecode(data.toByteArray, minCode, iw * ih).flatMap {
            idx =>
              val px = new Array[Int](iw * ih)
              val rowOf =
                if (interlaced) interlaceRows(ih)
                else Array.tabulate(ih)(identity)
              var ok = true
              var r = 0
              while (ok && r < ih) {
                val y = rowOf(r)
                var x = 0
                while (ok && x < iw) {
                  val i = idx(r * iw + x) & 0xff
                  if (i >= pal.length) ok = false // index off the palette
                  else {
                    val rgb = pal(i)
                    px(y * iw + x) =
                      (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
                        29 * (rgb & 0xff)) >> 8
                    x += 1
                  }
                }
                r += 1
              }
              if (ok) Some(PngCodec.Luma(iw, ih, px)) else None
          }
        case 0x3b => return None // trailer before any image
        case _ => return None // malformed block stream
      }
    }
    None
  }
}
