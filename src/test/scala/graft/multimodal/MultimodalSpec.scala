package graft.multimodal

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("mm_features: deterministic stub decode + real byte stats") {
    val rows = Multimodal.mmFeatures(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set("png", "jpeg", "webp").contains(r.getAs[String]("fmt")))
      val w = r.getAs[Int]("width"); val h = r.getAs[Int]("height")
      assert(w >= 64 && w < 256 && h >= 64 && h < 256)
      val mean = r.getAs[Double]("mean_byte")
      assert(mean > 0 && mean < 256)
      assert(r.getAs[Int]("n_bytes") > 0)
      // resize: fits the target box, preserves aspect (long side = 64)
      val (ow, oh) = (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"))
      assert(ow <= Multimodal.ResizeTarget && oh <= Multimodal.ResizeTarget)
      assert(math.max(ow, oh) == Multimodal.ResizeTarget)
    }
    // deterministic across runs
    val again = Multimodal.mmFeatures(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("mm_frames samples evenly-spaced deterministic frames") {
    val rows = Multimodal.mmFrames(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, fs) =>
      assert(fs.length == Multimodal.FramesPerDoc)
      val offsets = fs.sortBy(_.getAs[Int]("frame_idx"))
        .map(_.getAs[Int]("offset")).toSeq
      assert(offsets.head == 0)
      assert(offsets == offsets.sorted)
      fs.foreach { f =>
        assert(f.getAs[Int]("frame_bytes") <= Multimodal.FrameWindow)
        val m = f.getAs[Double]("mean_byte")
        assert(m >= 0 && m < 256)
      }
    }
  }

  test("mm_audio_energy: windows tile the payload, amplitudes bounded") {
    val rows = Multimodal.mmAudioEnergy(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val perDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    val sizes = graft.Tables(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text").cast("binary"))
          .as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    perDoc.foreach { case (doc, ws) =>
      // windows are consecutive and cover every byte exactly once
      assert(ws.map(_.getAs[Int]("n_samples")).sum == sizes(doc))
      assert(ws.map(_.getAs[Int]("win_idx")).sorted.toSeq ==
        (0 until ws.length))
      ws.foreach { w =>
        val rms = w.getAs[Double]("rms")
        val peak = w.getAs[Int]("peak")
        assert(rms >= 0.0 && rms <= 128.0)
        assert(peak >= 0 && peak <= 128)
        assert(rms <= peak + 1e-9, "RMS cannot exceed the peak")
      }
    }
  }

  test("mm_embed_topk: 5 ranked neighbors per query, self excluded") {
    val rows = Multimodal.mmEmbedTopK(spark, sfDir).collect()
    val perQ = rows.groupBy(_.getAs[Long]("q_id"))
    assert(perQ.size == 10)
    perQ.foreach { case (q, ns) =>
      assert(ns.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5))
      assert(!ns.exists(_.getAs[Long]("neighbor_id") == q))
      // byte histograms are all-positive vectors: cosines sit in (0,1]
      ns.foreach { n =>
        val c = n.getAs[Double]("cos")
        assert(c > 0.0 && c <= 1.0)
      }
    }
  }

  test("mm_dedup: groups >= 2, keep_id is the minimum sampled member") {
    val rows = Multimodal.mmDedup(spark, sfDir).collect()
    assert(rows.nonEmpty, "bucket signature must produce real groups")
    rows.foreach { r =>
      assert(r.getAs[Long]("group_size") >= 2)
      val ids = r.getAs[String]("sample_ids").split(",").map(_.toLong)
      assert(ids.length <= 10 && ids.sameElements(ids.sorted))
      assert(r.getAs[Long]("keep_id") == ids.head)
    }
    // conservation: every doc lands in exactly one bucket; group sizes
    // over ALL buckets (incl. singletons) must sum to the corpus size
    val total = Multimodal.mmDedup(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("group_size")).head().getLong(0)
    val singles = graft.Tables(spark, sfDir, "documents").count() - total
    assert(singles >= 0)
  }

  private def be16(v: Int): Seq[Int] = Seq((v >> 8) & 0xff, v & 0xff)
  private def be32(v: Int): Seq[Int] =
    Seq((v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
  private def bytesOf(xs: Seq[Int]): Array[Byte] = xs.map(_.toByte).toArray

  test("decodeHeader parses a real PNG IHDR: true width/height") {
    val png = bytesOf(
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a) ++ // signature
        be32(13) ++ Seq(0x49, 0x48, 0x44, 0x52) ++ // len + "IHDR"
        be32(100) ++ be32(50) ++ // width, height
        Seq(8, 6, 0, 0, 0)) // bit depth, color type, ...
    assert(Multimodal.decodeHeader(png).contains(("png", 100, 50)))
    assert(Multimodal.decodeStub(png) == (("png", 100, 50)))
    // corrupt signature -> not a PNG, falls back
    val bad = png.clone(); bad(1) = 'Q'.toByte
    assert(Multimodal.decodeHeader(bad).isEmpty)
  }

  test("decodeHeader walks JPEG markers to SOF0 behind APP0 + DQT") {
    val jpeg = bytesOf(
      Seq(0xff, 0xd8) ++ // SOI
        Seq(0xff, 0xe0) ++ be16(16) ++ // APP0, len 16
        "JFIF".map(_.toInt) ++ Seq(0, 1, 1, 0, 0, 1, 0, 1, 0, 0) ++
        Seq(0xff, 0xdb) ++ be16(4) ++ Seq(0, 0) ++ // DQT (len 4)
        Seq(0xff, 0xc0) ++ be16(17) ++ Seq(8) ++ // SOF0, precision
        be16(240) ++ be16(320) ++ // height, width
        Seq(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)) // components
    assert(Multimodal.decodeHeader(jpeg).contains(("jpeg", 320, 240)))
    assert(Multimodal.decodeStub(jpeg) == (("jpeg", 320, 240)))
    // progressive variant (SOF2) parses the same frame header
    val prog = jpeg.clone()
    prog(jpeg.indexOfSlice(Array(0xff.toByte, 0xc0.toByte)) + 1) =
      0xc2.toByte
    assert(Multimodal.decodeHeader(prog).contains(("jpeg", 320, 240)))
    // SOS before any SOF -> no frame header, falls back
    val sos = bytesOf(Seq(0xff, 0xd8, 0xff, 0xda) ++ be16(4) ++ Seq(0, 0))
    assert(Multimodal.decodeHeader(sos).isEmpty)
    // SOF buried behind more than JpegMaxSegs segments -> bounded walk
    // gives up deterministically
    val deep = bytesOf(
      Seq(0xff, 0xd8) ++
        (1 to Multimodal.JpegMaxSegs + 1).flatMap(_ =>
          Seq(0xff, 0xfe) ++ be16(3) ++ Seq(0)) ++ // COM segments
        Seq(0xff, 0xc0) ++ be16(17) ++ Seq(8) ++ be16(1) ++ be16(1) ++
        Seq(1, 1, 0x11, 0))
    assert(Multimodal.decodeHeader(deep).isEmpty)
  }

  test("decodeHeader parses GIF logical-screen and WebP VP8X canvas " +
      "dims; ASCII-signature text replays identically (oracle arm)") {
    val gif = bytesOf("GIF89a".map(_.toInt) ++
      Seq(0x40, 0x01, 0xf0, 0x00) ++ Seq(0x91, 0, 0)) // 320 x 240
    assert(Multimodal.decodeHeader(gif).contains(("gif", 320, 240)))
    val gif87 = bytesOf("GIF87a".map(_.toInt) ++
      Seq(7, 0, 5, 0) ++ Seq(0, 0))
    assert(Multimodal.decodeHeader(gif87).contains(("gif", 7, 5)))
    val webp = bytesOf("RIFF".map(_.toInt) ++ Seq(0x2a, 0, 0, 0) ++
      "WEBPVP8X".map(_.toInt) ++ Seq(0x0a, 0, 0, 0) ++ // chunk size
      Seq(0, 0, 0, 0) ++ // flags + reserved
      Seq(0x7f, 0x02, 0x00) ++ Seq(0xdf, 0x01, 0x00)) // 640-1, 480-1
    assert(Multimodal.decodeHeader(webp).contains(("webp", 640, 480)))
    // a PLAIN-TEXT doc whose UTF-8 bytes happen to spell a GIF header:
    // reachable from the documents table, so the DuckDB oracle mirrors
    // this arm byte-for-byte (the spec value below is the contract)
    val txt = "GIF89aABCD some perfectly ordinary text"
    assert(Multimodal.decodeHeader(txt.getBytes("UTF-8"))
      .contains(("gif", 65 + 66 * 256, 67 + 68 * 256)))
    // simple-format WebP (VP8 /VP8L fourCC): entropy-coded dims -> fallback
    val simple = bytesOf("RIFF".map(_.toInt) ++ Seq(0x2a, 0, 0, 0) ++
      "WEBPVP8 ".map(_.toInt) ++ Seq.fill(18)(0))
    assert(Multimodal.decodeHeader(simple).isEmpty)
  }

  test("UTF-8 text payloads can never reach the PNG/JPEG arms") {
    // 0x89 is a UTF-8 continuation byte (invalid initial) and 0xff
    // never occurs in UTF-8 — so text-derived payloads can only hit
    // the ASCII-signature arms (GIF/WebP, mirrored in the oracle) or
    // fall back; the PNG/JPEG arms are oracle-omittable
    val texts = Seq("hello", "", "Σσ käse", "a b c", "ÿ")
    texts.foreach { t =>
      assert(Multimodal.decodeHeader(t.getBytes("UTF-8")).isEmpty, t)
    }
  }

  test("decodeStub is pure and total") {
    val a = Multimodal.decodeStub("hello".getBytes)
    assert(a == Multimodal.decodeStub("hello".getBytes))
    // empty payload doesn't crash
    val (fmt, w, h) = Multimodal.decodeStub(Array.emptyByteArray)
    assert(fmt.nonEmpty && w >= 64 && h >= 64)
  }

  test("mm_phash_pairs: planted dups found, every pair verified, " +
      "pigeonhole recall holds below the band count") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog, twice over"
    // doc 3 tweaks byte offset 6 — one of phashStub's SAMPLED offsets
    // (len 55 → samples at 0,6,13,20,27,34,41,48), so the pair lands
    // at a NONZERO Hamming distance and exercises the 1..τ verify path
    // that an exact dup cannot
    val docs = Seq(
      (1L, base), (2L, base), // exact dup → hamming 0
      (3L, base.updated(6, 'X')),
      (4L, "completely unrelated payload with different bytes here!!")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.phashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Int]("hamming"))
      .toMap
    assert(out((1L, 2L)) == 0, "exact duplicate must pair at hamming 0")
    val hm13 = java.lang.Long.bitCount(
      Multimodal.phashStub(base.getBytes) ^
        Multimodal.phashStub(base.updated(6, 'X').getBytes))
    assert(hm13 > 0 && hm13 <= Multimodal.PhashMaxHamming,
      s"planted tweak must be a NONZERO near-dup, got $hm13")
    assert(out((1L, 3L)) == hm13,
      "the nonzero-distance pair must survive banding + verify")
    out.values.foreach(hm =>
      assert(hm >= 0 && hm <= Multimodal.PhashMaxHamming))
    // brute-force recall check on the sf corpus: any pair with
    // hamming < 4 bands MUST share an untouched band → always found
    val hashes = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        Multimodal.phashStub(r.getString(1).getBytes("UTF-8")))
    val found = Multimodal.mmPhashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for {
      (ia, pa) <- hashes; (ib, pb) <- hashes if ia < ib
      hm = java.lang.Long.bitCount(pa ^ pb) if hm < 4
    } assert(found((ia, ib)),
      s"pair ($ia,$ib) at hamming $hm escaped the banding")
  }

  test("mm_phash_clusters: a re-encode chain closes transitively into " +
      "one cluster; unrelated payloads stay out") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog, twice over"
    // 1~2 exact, 2~3 within tau via the sampled-offset tweak — so
    // {1,2,3} must land in ONE min-id-labeled cluster even if 1~3
    // were to sit above tau; 4 pairs with nothing
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, base.updated(6, 'X')),
      (4L, "completely unrelated payload with different bytes here!!")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val out = Multimodal.phashClusters(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size")))
      .toMap
    assert(out.keySet == Set(1L, 2L, 3L),
      s"only paired payloads cluster, got ${out.keySet}")
    assert(out.values.toSet == Set((1L, 3L)),
      "one cluster, canonical min-id label 1, size 3")
    // cluster membership conserves the pair frame's node set on sf
    val pairNodes = Multimodal.mmPhashPairs(spark, sfDir).collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val clNodes = Multimodal.mmPhashClusters(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(clNodes == pairNodes)
  }

  test("mm_shard_pack: manifest equals a sequential local replay of " +
      "the greedy byte walk, bytes conserve, budget holds") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8").length)
    // sequential reference: per stream in doc_id order
    val expected = docs.groupBy { case (id, _) => id % Multimodal.ShardStreams }
      .flatMap { case (pid, members) =>
        var shard = 0L; var running = 0L
        val out = collection.mutable.Map
          .empty[Long, (Long, Long, List[Long])]
        for ((id, n) <- members.sortBy(_._1)) {
          if (running > 0 && running + n > Multimodal.ShardBytes) {
            shard += 1; running = 0L
          }
          running += n
          val (c, b, ids) = out.getOrElse(shard, (0L, 0L, Nil))
          out(shard) = (c + 1, b + n, ids :+ id)
        }
        out.map { case (s, (c, b, ids)) =>
          (pid, s) -> (c, b, md5Hex(ids.mkString(":")))
        }
      }
    val got = Multimodal.mmShardPack(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got == expected)
    assert(got.values.map(_._2).sum == docs.map(_._2.toLong).sum,
      "shard bytes must conserve corpus bytes")
    got.foreach { case (k, (c, b, _)) =>
      assert(b <= Multimodal.ShardBytes || c == 1,
        s"shard $k over budget with $c samples")
    }
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Canonical minimal PCM WAV: RIFF + 16-byte fmt + data at 36. */
  private def wavBytes(bits: Int, channels: Int, data: Array[Byte],
      declaredDs: Option[Int] = None): Array[Byte] = {
    val bb = java.nio.ByteBuffer
      .allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val rate = 8000
    bb.put("RIFF".getBytes("US-ASCII"))
      .putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1.toShort).putShort(channels.toShort)
      .putInt(rate).putInt(rate * channels * bits / 8)
      .putShort((channels * bits / 8).toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII"))
      .putInt(declaredDs.getOrElse(data.length))
      .put(data)
    bb.array()
  }

  test("wavSamples (r15): real 8/16-bit PCM decode — header excluded, " +
      "signed 16-bit little-endian, data-size clamp, odd-byte drop, " +
      "non-canonical layouts fall back") {
    // 8-bit mono: samples are unsigned bytes centered at 128
    val d8 = Array.tabulate(7)(i => (30 * i).toByte)
    assert(Multimodal.wavSamples(wavBytes(8, 1, d8)).get.toSeq ==
      d8.map(b => (b & 0xff) - 128).toSeq)
    // 16-bit mono: signed LE including negatives and extremes
    val vals = Seq(0, 1, -1, 32767, -32768, 12345, -12345)
    val d16 = {
      val bb = java.nio.ByteBuffer.allocate(vals.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vals.foreach(v => bb.putShort(v.toShort)); bb.array()
    }
    assert(Multimodal.wavSamples(wavBytes(16, 1, d16)).get.toSeq == vals)
    // 16-bit stereo: channels stay interleaved in file order
    assert(Multimodal.wavSamples(wavBytes(16, 2, d16)).get.toSeq == vals)
    // declared data size clamps to the actual payload (truncated file)
    assert(Multimodal.wavSamples(
      wavBytes(8, 1, d8, declaredDs = Some(1000))).get.length == 7)
    // declared size smaller than payload: trailing bytes ignored
    assert(Multimodal.wavSamples(
      wavBytes(8, 1, d8, declaredDs = Some(3))).get.toSeq ==
      d8.take(3).map(b => (b & 0xff) - 128).toSeq)
    // odd trailing byte of a 16-bit stream drops
    assert(Multimodal.wavSamples(
      wavBytes(16, 1, d16 :+ 9.toByte)).get.toSeq == vals)
    // fall-backs: wrong depth, float format, non-canonical chunk order
    assert(Multimodal.wavSamples(wavBytes(24, 1, d8)).isEmpty)
    val float32 = wavBytes(16, 1, d16)
    float32(20) = 3 // IEEE-float format tag
    assert(Multimodal.wavSamples(float32).isEmpty)
    val extraChunk = wavBytes(16, 1, d16)
    extraChunk(36) = 'L'.toByte // "LIST" where "data" must sit
    assert(Multimodal.wavSamples(extraChunk).isEmpty)
    assert(Multimodal.wavSamples("RIFFxxWAVE".getBytes).isEmpty)
    assert(Multimodal.wavSamples(Array.empty[Byte]).isEmpty)
  }

  test("mm_audio_energy WAV arm end-to-end: genuine PCM payloads " +
      "window over REAL samples, text payloads keep the stub arm") {
    import spark.implicits._
    // ASCII-safe 8-bit WAV (every byte < 0x80) survives the text
    // round-trip — the reachability case the oracle mirrors. ds chosen
    // so BOTH little-endian size fields (ds = 300 → 2C 01, riff size
    // 336 → 50 01) stay below 0x80 per byte.
    val ds = 300
    val pcm = Array.tabulate(ds)(i => (32 + (i * 7) % 90).toByte)
    val wav = wavBytes(8, 1, pcm)
    assert(wav.forall(b => (b & 0xff) < 0x80), "must survive UTF-8")
    val tmp = java.nio.file.Files.createTempDirectory("graft-wav").toString
    Seq((1L, new String(wav, "US-ASCII")), (2L, "plain text payload"))
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = Multimodal.mmAudioEnergy(spark, tmp).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    // doc 1: windows over the 300 DATA samples, not the 344 file bytes
    val w1 = rows(1L).sortBy(_.getAs[Int]("win_idx"))
    assert(w1.map(_.getAs[Int]("n_samples")).toSeq == Seq(100, 100, 100))
    val ref = pcm.map(b => (b & 0xff) - 128)
    def rms(s: Array[Int]): Double = BigDecimal(math.sqrt(
      s.foldLeft(0L)((a, x) => a + x.toLong * x).toDouble / s.length))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(w1(0).getAs[Double]("rms") == rms(ref.take(100)))
    assert(w1(2).getAs[Double]("rms") == rms(ref.drop(200)))
    assert(w1(0).getAs[Int]("peak") == ref.take(100).map(math.abs).max)
    // doc 2: stub arm unchanged — windows tile the raw bytes
    val w2 = rows(2L)
    assert(w2.map(_.getAs[Int]("n_samples")).sum ==
      "plain text payload".length)
  }
}
