package graft.multimodal

import java.awt.image.BufferedImage

import graft.SparkSpec

/** Pins the real baseline-JPEG pixel tier on ImageIO-encoded fixtures
  * — the arm the DuckDB gate can never reach (JPEG's 0xFF lead byte
  * is not valid UTF-8), so these specs are its correctness evidence:
  * luma fidelity against the JDK's independent libjpeg-style decoder,
  * header/pixel dimension agreement, the quality-re-encode clustering
  * property the byte-level stub provably lacks, and the graceful
  * fallback for the scan types the tier declares out of scope.
  */
class JpegCodecSpec extends SparkSpec {

  // ---- fixtures: deterministic images + ImageIO JPEG encoding ----

  private def gradientImage(w: Int, h: Int,
      gray: Boolean = false): BufferedImage = {
    val img = new BufferedImage(w, h,
      if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      // smooth ramps + a block and a diagonal edge: enough spectral
      // structure that the 8x8 low-frequency pHash block is non-trivial
      val r = (x * 255 / math.max(w - 1, 1)) & 0xff
      val g = (y * 255 / math.max(h - 1, 1)) & 0xff
      val b = if ((x / 8 + y / 8) % 2 == 0) 200 else 40
      val d = if (x > y) 255 else 0
      val rr = (r + d) / 2; val gg = (g + 255 - d) / 2; val bb = b
      img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
    }
    img
  }

  private def encodeJpeg(img: BufferedImage, quality: Float,
      progressive: Boolean = false): Array[Byte] = {
    import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
    val w = ImageIO.getImageWritersByFormatName("jpeg").next()
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    w.setOutput(ios)
    val p = w.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    if (progressive) p.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    w.write(null, new IIOImage(img, null, null), p)
    w.dispose(); ios.close()
    out.toByteArray
  }

  /** Reference luma of a decoded-by-ImageIO JPEG. Single-component
    * files read the raster directly — getRGB on a gray image routes
    * through color management (linear-gray → sRGB gamma), which would
    * corrupt the reference, not test the decoder. Color files take
    * BT.601 integer luma on the round-tripped RGB.
    */
  private def imageioLuma(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    val px = new Array[Int](w * h)
    val gray = img.getColorModel.getNumComponents == 1
    for (y <- 0 until h; x <- 0 until w) {
      px(y * w + x) =
        if (gray) img.getRaster.getSample(x, y, 0)
        else {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          (77 * r + 150 * g + 29 * b) >> 8
        }
    }
    (w, h, px)
  }

  private def ham(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("luma fidelity: decoded Y agrees with the JDK's independent " +
      "decoder within IDCT rounding, grayscale and subsampled color") {
    for (gray <- Seq(true, false)) {
      val bytes = encodeJpeg(gradientImage(96, 64, gray), 0.9f)
      val l = JpegCodec.decodeLuma(bytes)
        .getOrElse(fail(s"gray=$gray: decode returned None"))
      val (rw, rh, ref) = imageioLuma(bytes)
      assert(l.width == rw && l.height == rh)
      val diffs = l.px.indices.map(i => math.abs(l.px(i) - ref(i)))
      val mean = diffs.sum.toDouble / diffs.size
      // gray: same Y plane through two IDCTs (±1-2/px); color adds
      // the YCbCr->RGB->BT.601 round trip on the reference side
      assert(mean <= (if (gray) 1.5 else 3.0),
        s"gray=$gray mean |luma diff| $mean")
      assert(ham(PngCodec.phash(l),
        PngCodec.phash(PngCodec.Luma(rw, rh, ref))) <= 4)
    }
  }

  test("dimensions: decodeLuma agrees with decodeHeader's marker " +
      "parse on every fixture size, including non-multiple-of-MCU") {
    for ((w, h) <- Seq((8, 8), (17, 9), (37, 23), (64, 48), (100, 1),
        (1, 100)); gray <- Seq(true, false)) {
      val bytes = encodeJpeg(gradientImage(w, h, gray), 0.8f)
      val hdr = Multimodal.decodeHeader(bytes)
      assert(hdr.exists(_._1 == "jpeg"), s"${w}x$h header parse")
      val l = JpegCodec.decodeLuma(bytes)
        .getOrElse(fail(s"${w}x$h gray=$gray: decode returned None"))
      assert((l.width, l.height) == (w, h))
      assert(hdr.get._2 == w && hdr.get._3 == h)
      assert(l.px.length == w * h && l.px.forall(p => p >= 0 && p <= 255))
    }
  }

  test("re-encode pair: quality 0.9 vs 0.55 of the same pixels hash " +
      "together through the REAL tier; the byte stub provably cannot") {
    val img = gradientImage(128, 96)
    val hi = encodeJpeg(img, 0.9f)
    val lo = encodeJpeg(img, 0.55f)
    assert(!java.util.Arrays.equals(hi, lo), "fixtures must differ in bytes")
    val hHi = PngCodec.phashOf(hi)
    val hLo = PngCodec.phashOf(lo)
    assert(ham(hHi, hLo) <= Multimodal.PhashMaxHamming,
      s"real-tier hamming ${ham(hHi, hLo)}")
    // the stub hashes raw bytes: two encodings of the SAME image land
    // far apart — the clustering property only pixels can provide
    assert(ham(Multimodal.phashStub(hi), Multimodal.phashStub(lo)) >
      Multimodal.PhashMaxHamming)
    // and a different image's hash stays far away through the real tier
    val other = encodeJpeg(gradientImage(128, 96, gray = true), 0.9f)
    val flipped = new BufferedImage(128, 96, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 96; x <- 0 until 128)
      flipped.setRGB(x, y, img.getRGB(127 - x, y) ^ 0xffffff)
    assert(ham(hHi, PngCodec.phashOf(encodeJpeg(flipped, 0.9f))) >
      Multimodal.PhashMaxHamming)
    assert(other != null) // gray variant reserved for the tiers test
  }

  test("cross-format: a JPEG and the pHash of the same decoded pixels " +
      "agree — the two real tiers share one signature space") {
    val bytes = encodeJpeg(gradientImage(64, 64), 0.92f)
    val viaCodec = PngCodec.phashOf(bytes)
    val l = JpegCodec.decodeLuma(bytes).get
    assert(viaCodec == PngCodec.phash(l),
      "phashOf must route JPEGs through the pixel tier")
    assert(viaCodec >= 0, "bit 63 held at 0: codes stay non-negative")
  }

  test("progressive: SOF2 scans decode to the same luma as the JDK's " +
      "decoder, grayscale and subsampled color, odd sizes included") {
    for (gray <- Seq(true, false); (w, h) <- Seq((96, 64), (37, 23))) {
      val bytes = encodeJpeg(gradientImage(w, h, gray), 0.9f,
        progressive = true)
      assert(bytes.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2),
        "fixture must really be progressive (SOF2)")
      val l = JpegCodec.decodeLuma(bytes)
        .getOrElse(fail(s"gray=$gray ${w}x$h: progressive decode None"))
      val (rw, rh, ref) = imageioLuma(bytes)
      assert(l.width == rw && l.height == rh && (rw, rh) == (w, h))
      val mean = l.px.indices.map(i =>
        math.abs(l.px(i) - ref(i))).sum.toDouble / (w * h)
      assert(mean <= (if (gray) 1.5 else 3.0),
        s"gray=$gray ${w}x$h mean |luma diff| $mean")
    }
  }

  test("progressive: a progressive and a baseline encoding of the " +
      "same pixels hash together through the real tier") {
    val img = gradientImage(128, 96)
    val base = encodeJpeg(img, 0.9f)
    val prog = encodeJpeg(img, 0.9f, progressive = true)
    assert(!java.util.Arrays.equals(base, prog))
    val d = ham(PngCodec.phashOf(base), PngCodec.phashOf(prog))
    assert(d <= Multimodal.PhashMaxHamming, s"hamming $d")
    // while the stub on the same two byte streams lands far apart
    assert(ham(Multimodal.phashStub(base), Multimodal.phashStub(prog)) >
      Multimodal.PhashMaxHamming)
  }

  test("dimensions: decodeHeader and decodeLuma agree on progressive " +
      "(SOF2) fixtures too, including non-multiple-of-MCU sizes") {
    for ((w, h) <- Seq((8, 8), (17, 9), (37, 23), (64, 48), (100, 1),
        (1, 100)); gray <- Seq(true, false)) {
      val bytes = encodeJpeg(gradientImage(w, h, gray), 0.8f,
        progressive = true)
      val hdr = Multimodal.decodeHeader(bytes)
      assert(hdr.exists(_._1 == "jpeg"), s"${w}x$h SOF2 header parse")
      assert(hdr.get._2 == w && hdr.get._3 == h)
      val l = JpegCodec.decodeLuma(bytes)
        .getOrElse(fail(s"${w}x$h gray=$gray: SOF2 decode returned None"))
      assert((l.width, l.height) == (w, h))
      assert(l.px.length == w * h && l.px.forall(p => p >= 0 && p <= 255))
    }
  }

  test("allocation cap: a doctored header claiming huge dimensions is " +
      "rejected up front — no multi-GiB plane is ever attempted") {
    def doctorDims(bytes: Array[Byte], sofMarker: Int,
        w: Int, h: Int): Array[Byte] = {
      val out = bytes.clone()
      val sof = out.sliding(2).indexWhere(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == sofMarker)
      assert(sof >= 0, f"no SOF$sofMarker%02x in fixture")
      // SOF payload: len(2) precision(1) h(2) w(2) ...
      out(sof + 5) = ((h >> 8) & 0xff).toByte
      out(sof + 6) = (h & 0xff).toByte
      out(sof + 7) = ((w >> 8) & 0xff).toByte
      out(sof + 8) = (w & 0xff).toByte
      out
    }
    val base = encodeJpeg(gradientImage(24, 24), 0.8f)
    val prog = encodeJpeg(gradientImage(24, 24), 0.8f, progressive = true)
    // 40000×40000 = 1.6e9 px: would be a ~6.4 GiB int plane (baseline)
    // or ~16 GiB of coefficients (progressive) without the 64 MPix cap
    assert(JpegCodec.decodeLuma(doctorDims(base, 0xc0, 40000, 40000))
      .isEmpty, "baseline huge-dims must reject")
    assert(JpegCodec.decodeLuma(doctorDims(prog, 0xc2, 40000, 40000))
      .isEmpty, "progressive huge-dims must reject")
    // just over the cap rejects; a legitimate size still decodes
    assert(JpegCodec.decodeLuma(doctorDims(base, 0xc0, 16384, 4097))
      .isEmpty, "just-over-cap must reject")
    assert(JpegCodec.decodeLuma(base).isDefined)
  }

  test("fallback: arithmetic-coded frames, truncations, and non-JPEG " +
      "bytes return None and phashOf degrades to the stub, never throws") {
    // doctor a real progressive stream's SOF2 into SOF9 (arithmetic
    // sequential): same header layout, out-of-scope coding -> None
    val prog = encodeJpeg(gradientImage(48, 32), 0.8f, progressive = true)
    val arith = prog.clone()
    val sof = arith.sliding(2).indexWhere(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2)
    arith(sof + 1) = 0xc9.toByte
    assert(JpegCodec.decodeLuma(arith).isEmpty)
    assert(PngCodec.phashOf(arith) == Multimodal.phashStub(arith))
    // arbitrary byte soup: header-truncated fixtures fall back (a cut
    // AFTER the complete scan still decodes — only EOI is missing —
    // so deep cuts assert no-throw rather than None)
    val bytes = encodeJpeg(gradientImage(24, 24), 0.8f)
    for (cut <- Seq(1, 2, 3, 4, 20, 100)) {
      val t = bytes.take(cut)
      assert(JpegCodec.decodeLuma(t).isEmpty, s"cut=$cut")
      PngCodec.phashOf(t) // must not throw
    }
    for (cut <- bytes.length / 2 until bytes.length by 37)
      PngCodec.phashOf(bytes.take(cut)) // never throws, any truncation
    for (cut <- 1 until prog.length by 23)
      PngCodec.phashOf(prog.take(cut)) // progressive truncations too
    assert(JpegCodec.decodeLuma("not a jpeg".getBytes("UTF-8")).isEmpty)
  }
}
