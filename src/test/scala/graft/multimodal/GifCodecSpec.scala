package graft.multimodal

import graft.SparkSpec

/** Pins the real GIF pixel tier ([[GifCodec]], r15). The DuckDB gate
  * never reaches this arm — not because the signature is
  * unrepresentable (GIF's is plain ASCII) but because of the explicit
  * UTF-8 gate — so, as with PNG/JPEG, the specs are its correctness
  * evidence: luma fidelity against the JDK's own ImageIO GIF codec
  * (encode with the JDK, decode with ours, byte-compare the luma
  * grid), interlace reorder, LZW dictionary resets on noisy payloads,
  * the re-encode clustering property the stub provably lacks, and the
  * cross-format contract (a GIF and a PNG of the same pixels hash
  * identically).
  */
class GifCodecSpec extends SparkSpec {

  /** Deterministic indexed test image on the JDK's default 256-color
    * palette (web-safe 216 + grays — plenty of high bytes, so the
    * encoded file can never be valid UTF-8 and the gate stays open).
    */
  private def indexedImage(w: Int, h: Int,
      idx: (Int, Int) => Int): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, idx(x, y) & 0xff)
    bi
  }

  private def encode(bi: java.awt.image.BufferedImage, fmt: String,
      interlaced: Boolean = false): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName(fmt).next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    val p = writer.getDefaultWriteParam
    val meta =
      if (!interlaced) null
      else {
        // force the interlace flag through the GIF image metadata tree
        // (the writer ignores progressiveMode on its param)
        val m = writer.getDefaultImageMetadata(
          javax.imageio.ImageTypeSpecifier.createFromRenderedImage(bi), p)
        val fmtName = m.getNativeMetadataFormatName
        val tree = m.getAsTree(fmtName).asInstanceOf[org.w3c.dom.Element]
        tree.getElementsByTagName("ImageDescriptor").item(0)
          .asInstanceOf[org.w3c.dom.Element]
          .setAttribute("interlaceFlag", "TRUE")
        m.setFromTree(fmtName, tree)
        m
      }
    writer.write(null, new javax.imageio.IIOImage(bi, null, meta), p)
    writer.dispose(); ios.close()
    baos.toByteArray
  }

  /** BT.601 luma grid of an image as the JDK decodes it. */
  private def jdkLuma(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val bi = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    val px = Array.tabulate(bi.getHeight * bi.getWidth) { i =>
      val rgb = bi.getRGB(i % bi.getWidth, i / bi.getWidth)
      (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
        29 * (rgb & 0xff)) >> 8
    }
    (bi.getWidth, bi.getHeight, px)
  }

  test("luma fidelity vs the JDK decoder: structured and noisy " +
      "payloads (noise forces LZW dictionary growth + resets)") {
    for ((w, h, f) <- Seq[(Int, Int, (Int, Int) => Int)](
        (16, 11, (x, y) => (x * 16 + y) % 256), // structured gradient
        (64, 64, (x, y) => (x * 31 + y * 17 + (x * y) % 7) % 256), // noise
        (1, 1, (_, _) => 200))) { // degenerate single pixel
      val gif = encode(indexedImage(w, h, f), "gif")
      val got = GifCodec.decodeLuma(gif)
      assert(got.isDefined, s"JDK-written $w×$h GIF must decode")
      val (jw, jh, jpx) = jdkLuma(gif)
      assert(got.get.width == jw && got.get.height == jh)
      assert(got.get.px.toSeq == jpx.toSeq,
        s"luma drifted from the JDK decode on the $w×$h image")
    }
  }

  test("interlaced GIF decodes to the SAME luma as its sequential " +
      "twin, and the pHash family treats the two files as one image " +
      "where the byte stub provably cannot") {
    val bi = indexedImage(40, 33, (x, y) => (x * 7 + y * 13) % 256)
    val seqB = encode(bi, "gif")
    val intB = encode(bi, "gif", interlaced = true)
    assert(!seqB.sameElements(intB), "the two encodings must differ")
    val a = GifCodec.decodeLuma(seqB).get
    val b = GifCodec.decodeLuma(intB).get
    assert(a.px.toSeq == b.px.toSeq, "interlace reorder must be exact")
    assert(PngCodec.phashOf(seqB) == PngCodec.phashOf(intB))
    assert(Multimodal.phashStub(seqB) != Multimodal.phashStub(intB),
      "the byte stub must fail where the pixel tier succeeds")
  }

  test("cross-format contract: a GIF and a PNG of the same pixels " +
      "hash identically (shared luma + pHash pipeline)") {
    val bi = indexedImage(32, 32, (x, y) => (x * 11 + y * 3) % 256)
    val gif = encode(bi, "gif")
    val png = encode(bi, "png")
    assert(GifCodec.decodeLuma(gif).get.px.toSeq ==
      PngCodec.decodeLuma(png).get.px.toSeq)
    assert(PngCodec.phashOf(gif) == PngCodec.phashOf(png))
  }

  test("oracle-reachability gate: any valid-UTF-8 payload returns " +
      "None even with a perfect GIF signature") {
    val textish = ("GIF89a" + "x" * 200).getBytes("UTF-8")
    assert(GifCodec.isValidUtf8(textish))
    assert(GifCodec.decodeLuma(textish).isEmpty)
    // a REAL JDK-written GIF is not valid UTF-8 (high palette bytes)
    val gif = encode(indexedImage(8, 8, (x, y) => x + y), "gif")
    assert(!GifCodec.isValidUtf8(gif))
    // so on the documents table the arm can never fire: every payload
    // there is the UTF-8 encoding of a string column
    val docs = graft.Tables(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("text").cast("binary"))
      .collect().map(_.getAs[Array[Byte]](0))
    assert(docs.forall(GifCodec.isValidUtf8),
      "documents payloads must all be valid UTF-8 (the gate's premise)")
    assert(docs.forall(b => GifCodec.decodeLuma(b).isEmpty))
  }

  test("malformed GIFs fall back to None: truncated LZW, trailer " +
      "before image, oversized first code, short header") {
    val good = encode(indexedImage(16, 16, (x, y) => x * y % 256), "gif")
    assert(GifCodec.decodeLuma(good).isDefined)
    // truncation anywhere in the data stream must not decode
    assert(GifCodec.decodeLuma(good.take(good.length - 8)).isEmpty)
    assert(GifCodec.decodeLuma(good.take(20)).isEmpty)
    assert(GifCodec.decodeLuma(Array[Byte]('G', 'I', 'F')).isEmpty)
    // header + immediate trailer: no image to decode. Bytes are kept
    // non-UTF-8 (0x80 screen-descriptor flag byte + 0xFF palette) so
    // the structural arm, not the gate, is what rejects it
    val noImage = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](2, 0, 2, 0, 0x80.toByte, 0, 0,
        0xff.toByte, 0, 0, 0, 0xff.toByte, 0, 0x3b)
    assert(GifCodec.decodeLuma(noImage).isEmpty)
  }
}
