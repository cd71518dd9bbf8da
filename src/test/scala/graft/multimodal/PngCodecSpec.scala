package graft.multimodal

import graft.SparkSpec

/** Pins the real PNG pixel tier on handcrafted PNGs — the arm the
  * DuckDB gate can never reach (PNG's 0x89 lead byte is not valid
  * UTF-8), so these specs are its correctness evidence: filter-type
  * round-trips against hand-built scanlines, and the re-encode
  * clustering property the byte-level stub provably lacks.
  */
class PngCodecSpec extends SparkSpec {

  // ---- minimal PNG encoder (spec-local; chunks + zlib + CRC32) ----

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val tb = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    val bb = java.nio.ByteBuffer.allocate(12 + data.length)
    bb.putInt(data.length).put(tb).put(data).putInt(crc.getValue.toInt)
    bb.array()
  }

  private def deflate(raw: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private val sig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Encode 8-bit RGB with a chosen filter type per row. */
  private def encodePng(w: Int, h: Int, rgb: (Int, Int) => (Int, Int, Int),
      rowFilter: Int => Int, level: Int = 6): Array[Byte] = {
    val ch = 3; val stride = w * ch
    val img = Array.tabulate(h, stride) { (y, x) =>
      val (r, g, b) = rgb(x / ch, y)
      Seq(r, g, b)(x % ch) & 0xff
    }
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val f = rowFilter(y)
      raw(y * (stride + 1)) = f.toByte
      for (x <- 0 until stride) {
        val cur = img(y)(x)
        val left = if (x >= ch) img(y)(x - ch) else 0
        val up = if (y > 0) img(y - 1)(x) else 0
        val ul = if (y > 0 && x >= ch) img(y - 1)(x - ch) else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
      }
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", deflate(raw, level)) ++
      chunk("IEND", Array.emptyByteArray)
  }

  private def lumaOf(r: Int, g: Int, b: Int): Int =
    (77 * r + 150 * g + 29 * b) >> 8

  // a structured test image: gradient with a bright block
  private def scene(x: Int, y: Int): (Int, Int, Int) =
    if (x >= 16 && x < 32 && y >= 16 && y < 32) (250, 240, 20)
    else (x * 4 % 256, y * 4 % 256, (x + y) % 256)

  test("all 5 filter types round-trip to the exact luma grid") {
    for (f <- 0 to 4) {
      val png = encodePng(48, 40, scene, _ => f)
      val out = PngCodec.decodeLuma(png)
      assert(out.isDefined, s"filter $f must decode")
      val l = out.get
      assert(l.width == 48 && l.height == 40)
      for (y <- 0 until 40; x <- 0 until 48) {
        val (r, g, b) = scene(x, y)
        assert(l.px(y * 48 + x) == lumaOf(r, g, b),
          s"filter $f pixel ($x,$y)")
      }
    }
    // mixed filters per row (the realistic encoder output)
    val mixed = encodePng(48, 40, scene, y => y % 5)
    val l = PngCodec.decodeLuma(mixed).get
    assert(l.px(20 * 48 + 20) == lumaOf(250, 240, 20))
  }

  test("unsupported/malformed PNGs fall back (None): 16-bit depth, " +
      "Adam7, truncated IDAT, bad filter byte") {
    val good = encodePng(16, 16, scene, _ => 0)
    assert(PngCodec.decodeLuma(good).isDefined)
    def patched(off: Int, v: Int): Array[Byte] = {
      val c = good.clone(); c(off) = v.toByte
      // CRC now wrong — decoder doesn't check CRC, which is fine here
      c
    }
    assert(PngCodec.decodeLuma(patched(24, 16)).isEmpty, "16-bit depth")
    assert(PngCodec.decodeLuma(patched(28, 1)).isEmpty, "interlaced")
    assert(PngCodec.decodeLuma(good.dropRight(60)).isEmpty, "truncated")
    assert(PngCodec.decodeLuma("not a png at all".getBytes).isEmpty)
  }

  test("re-encodes (different filters, compression levels — disjoint " +
      "byte streams) hash IDENTICALLY under the real pHash; the byte " +
      "stub provably cannot cluster them") {
    val a = encodePng(48, 40, scene, _ => 0, level = 1)
    val b = encodePng(48, 40, scene, y => y % 5, level = 9)
    val c = encodePng(48, 40, scene, _ => 4, level = 6)
    assert(!a.sameElements(b) && !b.sameElements(c))
    val ha = PngCodec.phashOf(a)
    assert(ha == PngCodec.phashOf(b) && ha == PngCodec.phashOf(c))
    // the stub reads sampled BYTES, which the re-encode scrambled
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(Multimodal.phashStub(a), Multimodal.phashStub(b)) >
      Multimodal.PhashMaxHamming,
      "stub must NOT see re-encodes as near-dups — that's the gap " +
        "the pixel tier closes")
  }

  test("perceptual metric: +1 brightness is a near-dup, a different " +
      "scene is far") {
    val base = encodePng(48, 40, scene, _ => 0)
    val bright = encodePng(48, 40,
      (x, y) => { val (r, g, b) = scene(x, y)
        (math.min(255, r + 1), math.min(255, g + 1), math.min(255, b + 1)) },
      _ => 0)
    val other = encodePng(48, 40,
      (x, y) => if ((x / 6 + y / 6) % 2 == 0) (255, 255, 255)
        else (0, 0, 30), _ => 0)
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val hb = PngCodec.phashOf(base)
    assert(ham(hb, PngCodec.phashOf(bright)) <= Multimodal.PhashMaxHamming)
    assert(ham(hb, PngCodec.phashOf(other)) > Multimodal.PhashMaxHamming)
  }

  test("decodeLuma dimensions agree with decodeHeader's IHDR parse " +
      "on every handcrafted PNG (the two tiers never disagree)") {
    for ((w, h) <- Seq((48, 40), (16, 16), (33, 7), (1, 1))) {
      val png = encodePng(w, h, scene, y => y % 5)
      val hdr = Multimodal.decodeHeader(png)
      val px = PngCodec.decodeLuma(png)
      assert(hdr.contains(("png", w, h)))
      assert(px.exists(l => l.width == w && l.height == h))
    }
  }

  test("phashPairs end-to-end: PNG re-encodes pair up through the " +
      "banded candidate join at hamming 0") {
    import spark.implicits._
    val a = encodePng(48, 40, scene, _ => 0, level = 1)
    val b = encodePng(48, 40, scene, y => y % 5, level = 9)
    val other = encodePng(48, 40,
      (x, y) => if ((x / 6 + y / 6) % 2 == 0) (255, 255, 255)
        else (0, 0, 30), _ => 0)
    val docs = Seq((1L, a), (2L, b), (3L, other))
      .toDF("doc_id", "payload")
    val pairs = Multimodal.phashPairs(docs).collect()
      .map(r => (r.getAs[Long]("ia"), r.getAs[Long]("ib"),
        r.getAs[Int]("hamming")))
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }
}
