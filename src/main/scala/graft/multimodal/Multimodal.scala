package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column operators (SURVEY.md §2.F): media payloads as
  * opaque `binary` columns with typed metadata. The Spark-side plumbing
  * (schema, batching, partition-parallel decode) is real; the actual
  * codec is stubbed (no image/audio libs in this environment) behind a
  * clearly marked deterministic fake.
  */
object Multimodal {

  /** F1 `mm_meta` — binary payload plumbing: bytes, size, sha256
    * content digest, size-band. The digest is the multimodal analogue
    * of the text fingerprint (dedup key for raw media).
    */
  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    mmMetaOf(Tables(spark, dir, "documents"))


  /** [[mmMeta]]'s kernel on any documents-shaped frame. */
  def mmMetaOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("sha256"),
        when(length(col("payload")) >= 400, "large")
          .when(length(col("payload")) >= 200, "medium")
          .otherwise("small").as("size_band"))
      .orderBy(col("doc_id"))

  /** Extracted per-payload features. `fmt`/`width`/`height` come from
    * the stub decoder; `out_w`/`out_h` from the stub resize;
    * `mean_byte` is computed from the real bytes.
    */
  case class MmFeature(doc_id: Long, fmt: String, width: Int, height: Int,
      out_w: Int, out_h: Int, n_bytes: Int, mean_byte: Double)

  val ResizeTarget = 64

  /** ==== STUB RESIZE ====: aspect-preserving fit into
    * ResizeTarget×ResizeTarget — only the geometry (what a real
    * thumbnailer computes before touching pixels); the pixel resample
    * would live in the same partition pass as [[decodeStub]].
    */
  private[multimodal] def resizeStub(w: Int, h: Int): (Int, Int) = {
    val scale = ResizeTarget.toDouble / math.max(w, h)
    (math.max(1, math.round(w * scale).toInt),
      math.max(1, math.round(h * scale).toInt))
  }

  private[multimodal] val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Marker-walk bound for [[decodeHeader]]'s JPEG arm: a file whose
    * SOF hides behind more than this many pre-scan segments (APPn/EXIF
    * blobs, DQT, DHT, COM) falls back — an explicit bound keeps the
    * parse total and deterministic on adversarial input.
    */
  val JpegMaxSegs = 16

  /** REAL public-format header parse — PNG IHDR, a bounded JPEG SOF
    * marker walk, GIF logical-screen descriptor, and WebP VP8X canvas
    * size; plain byte-slicing from the public specs (PNG: 8-byte
    * signature, IHDR width/height as big-endian u32 at offsets 16/20;
    * JPEG: FFD8 then FF-marker segments, frame height/width as
    * big-endian u16 at SOFn payload offsets 3/5; GIF: "GIF87a"/
    * "GIF89a" then little-endian u16 screen width/height at 6/8;
    * WebP: RIFF/"WEBP"/"VP8X" then little-endian u24 canvas-minus-one
    * at 24/27 — the byte-aligned extended format; simple-format VP8/
    * VP8L dims are entropy-coded and fall back). Returns None for
    * anything else.
    *
    * Oracle reachability note: the PNG and JPEG signatures are
    * UNREPRESENTABLE in UTF-8 text (0x89 is a continuation byte,
    * 0xFF never occurs), so those arms can never fire on a payload
    * derived from the documents table and the DuckDB oracle omits
    * them. The GIF and WebP signatures ARE plain ASCII — a text
    * document could legitimately start with "GIF89a…" — so BOTH
    * oracles (mm_features, mm_dedup) mirror those two arms
    * byte-for-byte; cross-engine equivalence is total, not
    * probabilistic.
    */
  private[multimodal] def decodeHeader(
      b: Array[Byte]): Option[(String, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le24(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16)
    def ascii(i: Int, s: String): Boolean =
      b.length >= i + s.length &&
        s.indices.forall(j => u8(i + j) == s.charAt(j).toInt)
    def isSof(m: Int): Boolean =
      m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
    if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
        u8(12) == 'I' && u8(13) == 'H' && u8(14) == 'D' && u8(15) == 'R')
      Some(("png", be32(16), be32(20)))
    else if (b.length >= 10 && (ascii(0, "GIF87a") || ascii(0, "GIF89a")))
      Some(("gif", le16(6), le16(8)))
    else if (b.length >= 30 && ascii(0, "RIFF") && ascii(8, "WEBP") &&
        ascii(12, "VP8X"))
      Some(("webp", 1 + le24(24), 1 + le24(27)))
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var pos = 2
      var steps = 0
      while (steps < JpegMaxSegs && pos + 1 < b.length && u8(pos) == 0xff) {
        val m = u8(pos + 1)
        if (isSof(m))
          return if (pos + 8 < b.length)
            Some(("jpeg", be16(pos + 7), be16(pos + 5)))
          else None
        else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7))
          pos += 2 // standalone marker, no length field
        else if (m == 0xd9 || m == 0xda)
          return None // EOI / start-of-scan before any SOF
        else {
          if (pos + 3 >= b.length) return None
          val len = be16(pos + 2)
          if (len < 2) return None
          pos += 2 + len
        }
        steps += 1
      }
      None
    } else None
  }

  /** Payload decode: the REAL [[decodeHeader]] parse when the bytes
    * carry a public-format signature, else the ==== STUB DECODER ====
    * deterministic fake (format/dimensions derived from payload bytes
    * so tests are stable) standing in for the full pixel codec, which
    * is not installed in this container. Swap the fallback for a real
    * decoder (javax.imageio / ffmpeg bindings) in production — the
    * Spark plumbing around it does not change, and genuine PNG/JPEG
    * headers already report true dimensions through this path.
    */
  private[multimodal] def decodeStub(bytes: Array[Byte]): (String, Int, Int) =
    decodeHeader(bytes).getOrElse {
      val fmts = Array("png", "jpeg", "webp")
      val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
      val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
      (fmts(bytes.length % 3), 64 + b0 % 192, 64 + b1 % 192)
    }

  /** F2 `mm_features` — partition-parallel decode + feature extraction
    * over binary payloads via `mapPartitions`: one decoder instance per
    * partition (the real-codec pattern — decoder init is expensive),
    * rows streamed through it, typed output via case-class Encoder.
    */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    mmFeaturesOf(Tables(spark, dir, "documents"))

  /** [[mmFeatures]]'s kernel on caller documents frame. */
  def mmFeaturesOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (real codec)
        it.map { case (id, bytes) =>
          val (fmt, w, h) = decodeStub(bytes)
          val (ow, oh) = resizeStub(w, h)
          val mean =
            if (bytes.isEmpty) 0.0
            else {
              var s = 0L; var i = 0
              while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
              s.toDouble / bytes.length
            }
          MmFeature(id, fmt, w, h, ow, oh, bytes.length, mean)
        }
      }
      .toDF()
      // HALF_UP in the engine layer (not rint/HALF_EVEN in the stub) so
      // the DuckDB oracle's round() computes the identical value
      .withColumn("mean_byte", round(col("mean_byte"), 4))
      .orderBy(col("doc_id"))
  }

  /** One sampled "frame" of a binary payload. */
  case class MmFrame(doc_id: Long, frame_idx: Int, offset: Int,
      frame_bytes: Int, mean_byte: Double)

  val FramesPerDoc = 4
  val FrameWindow = 32

  /** F3 `mm_frames` — frame sampling over "video" payloads: each
    * payload yields `FramesPerDoc` evenly-spaced frames (a byte window
    * standing in for a decoded frame — the real codec would seek to
    * the timestamp instead; same ==== STUB ==== contract as
    * [[decodeStub]]). flatMap fan-out keeps frames with their source
    * partition — no shuffle until a consumer asks for one.
    */
  def mmFrames(spark: SparkSession, dir: String): DataFrame =
    mmFramesOf(Tables(spark, dir, "documents"))

  /** [[mmFrames]]'s kernel on caller documents frame. */
  def mmFramesOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (0 until FramesPerDoc).iterator.map { i =>
          val off =
            if (bytes.isEmpty) 0
            else (bytes.length.toLong * i / FramesPerDoc).toInt
          val frame = bytes.slice(off, math.min(off + FrameWindow, bytes.length))
          val mean =
            if (frame.isEmpty) 0.0
            else frame.map(b => (b & 0xff).toLong).sum.toDouble / frame.length
          MmFrame(id, i, off, frame.length, mean)
        }
      }
      .toDF()
      .withColumn("mean_byte", round(col("mean_byte"), 4))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  val MinRunLen = 8 // minimum printable run worth extracting

  /** F7 `mm_strings` — printable-text extraction from binary payloads
    * (the `strings(1)` pass of media triage, and the stub tier for an
    * OCR/ASR transcript extractor: a real decoder slots into the same
    * per-row map and feeds the SAME downstream columns): maximal runs
    * of ≥ [[MinRunLen]] printable ASCII chars, with run count, total
    * extracted chars, and a bounded preview of the first run. Output
    * feeds the C-section text gates (quality, langid, dedup) — the
    * multimodal→text bridge. Map-only, zero shuffle before the
    * deterministic sort.
    */
  def mmStrings(spark: SparkSession, dir: String): DataFrame =
    mmStringsOf(Tables(spark, dir, "documents"))


  /** [[mmStrings]]'s kernel on any documents-shaped frame. */
  def mmStringsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .withColumn("txt", decode(col("payload"), "UTF-8"))
      .withColumn("runs",
        expr(s"regexp_extract_all(txt, '[ -~]{$MinRunLen,}', 0)"))
      .select(col("doc_id"),
        size(col("runs")).as("n_runs"),
        expr("aggregate(transform(runs, r -> length(r)), 0, (a, x) -> a + x)")
          .as("extracted_chars"),
        when(size(col("runs")) > 0,
          substring(col("runs").getItem(0), 1, 40)).as("first_run"))
      .orderBy(col("doc_id"))

  val PhashMaxHamming = 8 // pair bar: ≤8 of 64 signature bits differ

  /** ==== STUB PERCEPTUAL HASH ====: 8 evenly spaced payload bytes
    * packed big-endian into a 63-bit word (the lead byte masked to
    * 7 bits so the code stays non-negative — DuckDB replays the pack
    * in exact integer arithmetic without unsigned 64-bit). A real DCT
    * pHash / audio chromaprint replaces this ONE function; the
    * banding, candidate join, and Hamming verify around it are
    * codec-agnostic.
    */
  private[multimodal] def phashStub(bytes: Array[Byte]): Long = {
    val n = bytes.length
    var h = if (n > 0) (bytes(0) & 0x7f).toLong else 0L
    var i = 1
    while (i < 8) {
      val off = n * i / 8
      h = (h << 8) | (if (off < n) bytes(off) & 0xff else 0)
      i += 1
    }
    h
  }

  case class MmHash(doc_id: Long, ph: Long)

  /** F8 `mm_phash_pairs` — perceptual-hash near-dup PAIR mining over
    * binary payloads: the scored-pair tier above F4's coarse bucket
    * groups and the media analogue of D4's SimHash banding. Per
    * payload, [[PngCodec.phashOf]] (partition-parallel map): the REAL
    * 32×32-luma DCT pHash when the bytes decode as a PNG, the
    * byte-arithmetic stub otherwise — on the registered query's
    * documents-derived payloads the PNG arm is unreachable (0x89 is
    * no UTF-8 lead byte, decodeHeader's oracle-reachability note), so
    * the DuckDB oracle replays the stub arm byte-for-byte unchanged
    * while PngCodecSpec pins the real arm on handcrafted PNGs. Then
    * 4×16-bit LSH bands generate candidates keyed on (band, value) —
    * the shuffle carries bounded band buckets, never all pairs — and
    * the exact 64-bit Hamming verify (codegen xor + bit_count) keeps
    * pairs ≤ [[PhashMaxHamming]]. Pigeonhole guarantee: any pair
    * closer than the band count (Hamming < 4) shares an untouched
    * band and is ALWAYS found; the spec pins that plus planted exact
    * duplicates.
    */
  def mmPhashPairs(spark: SparkSession, dir: String): DataFrame =
    mmPhashPairsOf(Tables(spark, dir, "documents"))


  /** [[mmPhashPairs]]'s kernel on any documents-shaped frame. */
  def mmPhashPairsOf(docs: DataFrame): DataFrame =
    phashPairs(docs
      .select(col("doc_id"), col("text").cast("binary").as("payload")))

  /** [[mmPhashPairs]]'s core on any (doc_id, payload) frame. */
  def phashPairs(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val sig = docs.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, b) => MmHash(id, PngCodec.phashOf(b)) }
      .toDF()
    val chunks = sig.select(col("doc_id"), col("ph"),
      posexplode(expr(
        "transform(sequence(0, 3), j -> (ph >> (j * 16)) & 65535)"))
        .as(Seq("band", "bv")))
    chunks
      .select(col("doc_id").as("ia"), col("ph").as("pha"),
        col("band"), col("bv"))
      .join(chunks.select(col("doc_id").as("ib"), col("ph").as("phb"),
        col("band"), col("bv")), Seq("band", "bv"))
      .filter(col("ia") < col("ib"))
      .select("ia", "ib", "pha", "phb").distinct()
      .withColumn("hamming",
        bit_count(col("pha").bitwiseXOR(col("phb"))))
      .filter(col("hamming") <= PhashMaxHamming)
      .select(col("ia"), col("ib"), col("hamming"))
      .orderBy(col("ia"), col("ib"))
  }

  /** F10 `mm_phash_clusters` — perceptual copy GROUPS from F8's pair
    * evidence, completing the multimodal dedup family the way D14
    * completed the substring one (F4 flags near-dup groups by exact
    * signature match, F8 mines banded Hamming-≤τ pairs; the drop/
    * canonicalize decision wants transitively-closed groups — a
    * re-encode chain A~B~C is ONE asset even when A and C differ by
    * more than τ bits): F8's pair frame becomes an edge list resolved
    * by the SAME `Dedup.connectedComponents` hybrid kernel
    * (D6/D14/A46's reuse), one row per clustered payload with its
    * canonical min-id label and cluster size. The CC kernel sees only
    * the O(pairs) edges, never payloads.
    */
  def mmPhashClusters(spark: SparkSession, dir: String): DataFrame =
    mmPhashClustersOf(Tables(spark, dir, "documents"))


  /** [[mmPhashClusters]]'s kernel on any documents-shaped frame. */
  def mmPhashClustersOf(docs: DataFrame): DataFrame =
    phashClusters(docs
      .select(col("doc_id"), col("text").cast("binary").as("payload")))

  /** [[mmPhashClusters]]'s core on any (doc_id, payload) frame. */
  def phashClusters(docs: DataFrame): DataFrame = {
    val edges = phashPairs(docs)
      .select(col("ia").as("u"), col("ib").as("v"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
    graft.dedup.Dedup.connectedComponents(edges)
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(wc))
      .orderBy(col("doc_id"))
  }

  val ShardStreams = 8    // deterministic parallel pack streams
  val ShardBytes = 4096   // shard payload-byte budget

  /** F9 `mm_shard_pack` — WebDataset-style shard layout for multimodal
    * training data: samples are dealt into [[ShardStreams]]
    * deterministic streams (doc_id mod), each stream packed greedily in
    * doc_id order into shards that close when the next payload would
    * exceed [[ShardBytes]] (an oversize payload gets its own shard —
    * C10's token rule, rebased onto payload BYTES, which is what bounds
    * a media shard). Emits the shard manifest a downstream dataloader
    * consumes: sample count, byte total, and the md5 identity of the
    * ordered member list — the selection pin that makes "same layout"
    * checkable across engines and runs (the C32 trick). Packing state
    * is sequential by nature, so it is the legitimate `mapPartitions`
    * pass; scale by adding streams, never by widening one. The member
    * order inside a shard IS doc_id order, so `array_sort` after the
    * shuffle reconstructs it exactly.
    */
  def mmShardPack(spark: SparkSession, dir: String): DataFrame =
    mmShardPackOf(Tables(spark, dir, "documents"))

  /** [[mmShardPack]]'s kernel on caller documents frame. */
  def mmShardPackOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(ShardStreams.toLong)).as("pid"),
        length(col("text").cast("binary")).as("n_bytes"))
      .repartition(col("pid"))
      .sortWithinPartitions(col("pid"), col("doc_id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        var curPid = Long.MinValue
        var shard = 0L
        var running = 0L
        it.map { case (id, pid, n) =>
          if (pid != curPid) { curPid = pid; shard = 0L; running = 0L }
          if (running > 0 && running + n > ShardBytes) {
            shard += 1; running = 0L
          }
          running += n
          (pid, shard, id, n.toLong)
        }
      }
      .toDF("pid", "shard_id", "doc_id", "n_bytes")
      .groupBy(col("pid"), col("shard_id"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col("n_bytes")).as("shard_bytes"),
        array_sort(collect_list(col("doc_id"))).as("ids"))
      .select(col("pid"), col("shard_id"), col("n_samples"),
        col("shard_bytes"),
        md5(expr("cast(concat_ws(':', transform(ids, x -> " +
          "cast(x as string))) as binary)")).as("ids_md5"))
      .orderBy(col("pid"), col("shard_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_strings" -> (mmStrings _),
    "mm_shard_pack" -> (mmShardPack _),
    "mm_meta" -> (mmMeta _),
    "mm_features" -> (mmFeatures _),
    "mm_frames" -> (mmFrames _),
    "mm_audio_energy" -> (mmAudioEnergy _),
    "mm_embed_topk" -> (mmEmbedTopK _),
    "mm_dedup" -> (mmDedup _),
    "mm_phash_pairs" -> (mmPhashPairs _),
    "mm_phash_clusters" -> (mmPhashClusters _)
  )

  /** The stub decoders are pure byte arithmetic, so even F2/F3 oracle
    * exactly: DuckDB recovers the raw UTF-8 bytes via the hex-digit
    * strpos trick (hex() → per-pair integer), then replays the fake
    * decode/resize/frame geometry in SQL.
    */
  case class MmAudioWin(doc_id: Long, win_idx: Int, n_samples: Int,
      rms: Double, peak: Int)

  val AudioWindow = 100 // samples per analysis window

  /** REAL public-format WAV parse (r15 — the audio analogue of
    * [[decodeHeader]]'s image arms): the canonical minimal RIFF/WAVE
    * layout from the public spec — "RIFF" + u32 size + "WAVE", a
    * 16-byte "fmt " chunk at offset 12 (PCM format tag 1, bits 8 or
    * 16), and the "data" chunk immediately at offset 36 with samples
    * from offset 44. That fixed layout is what every minimal PCM
    * writer emits; files with extra chunks (LIST/INFO), float or
    * compressed formats, or 24/32-bit depth fall back to the stub arm
    * — a bounded, loop-free parse keeps the arm total on adversarial
    * input AND byte-sliceable in the oracle's SQL mirror.
    *
    * Returns the decoded sample stream in file order (channels stay
    * interleaved — for windowed RMS energy that is the per-frame
    * energy across channels, the VAD-relevant quantity): 8-bit PCM is
    * unsigned centered at 128, 16-bit is signed little-endian. The
    * declared data size clamps to the actual payload (truncated
    * uploads), and a trailing odd byte of a 16-bit stream is dropped.
    *
    * Oracle reachability note: every magic here is ASCII/low-control
    * bytes, all representable in UTF-8 text, so the oracle mirrors
    * this arm byte-for-byte (the GIF/WebP precedent) — cross-engine
    * equivalence stays total, not probabilistic.
    */
  private[multimodal] def wavSamples(bytes: Array[Byte]): Option[Array[Int]] = {
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    def ascii(i: Int, s: String): Boolean =
      bytes.length >= i + s.length &&
        s.indices.forall(j => u8(i + j) == s.charAt(j).toInt)
    if (bytes.length >= 44 && ascii(0, "RIFF") && ascii(8, "WAVE") &&
        ascii(12, "fmt ") && le32(16) == 16L && le16(20) == 1 &&
        (le16(34) == 8 || le16(34) == 16) && ascii(36, "data")) {
      val ds = math.min(le32(40), (bytes.length - 44).toLong).toInt
      if (le16(34) == 8) Some(Array.tabulate(ds)(i => u8(44 + i) - 128))
      else Some(Array.tabulate(ds / 2) { j =>
        val v = le16(44 + 2 * j)
        if (v >= 32768) v - 65536 else v
      })
    } else None
  }

  /** F5 `mm_audio_energy` — audio-shaped signal analysis over binary
    * payloads: PCM samples split into consecutive [[AudioWindow]]-
    * sample windows, per-window RMS energy and peak amplitude — the
    * VAD/silence-trim front end of an audio pipeline. Genuine RIFF/WAV
    * payloads decode REAL samples through [[wavSamples]] (8/16-bit
    * PCM, header excluded, data-size honored); anything else takes the
    * stub arm (bytes ARE 8-bit samples centered at 128), standing in
    * for the full codec zoo. The windowing/flatMap fan-out is real
    * either way. RMS stays bit-exact cross-engine because the sum of
    * squares is integer arithmetic; the only floats are one division
    * and one sqrt.
    */
  def mmAudioEnergy(spark: SparkSession, dir: String): DataFrame =
    mmAudioEnergyOf(Tables(spark, dir, "documents"))

  /** [[mmAudioEnergy]]'s kernel on caller documents frame. */
  def mmAudioEnergyOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val samples = wavSamples(bytes)
          .getOrElse(bytes.map(b => (b & 0xff) - 128))
        val nw = (samples.length + AudioWindow - 1) / AudioWindow
        (0 until nw).iterator.map { w =>
          val s = samples.slice(w * AudioWindow,
            math.min((w + 1) * AudioWindow, samples.length))
          val sumSq = s.foldLeft(0L)((a, x) => a + x.toLong * x)
          MmAudioWin(id, w, s.length,
            math.sqrt(sumSq.toDouble / s.length),
            s.map(math.abs).max)
        }
      }
      .toDF()
      .withColumn("rms", round(col("rms"), 4))
      .orderBy(col("doc_id"), col("win_idx"))
  }

  /** F6 `mm_embed_topk` — cross-modal retrieval plumbing: media
    * payloads → embedding vectors → nearest-neighbor search, end to
    * end. The embedder is the stub tier (a 64-bucket byte histogram —
    * a real CLIP/CLAP encoder slots into the same per-partition map),
    * and the search is the E1 shape verbatim: queries broadcast,
    * corpus scanned once, deterministic 6-dp-rounded rank. Cosine over
    * integer-valued histograms stays bit-exact cross-engine — every
    * sum is exact integer arithmetic until the final division.
    */
  def mmEmbedTopK(spark: SparkSession, dir: String): DataFrame =
    mmEmbedTopKOf(Tables(spark, dir, "documents"))

  /** [[mmEmbedTopK]]'s kernel on caller documents frame. */
  def mmEmbedTopKOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // empty payloads embed to the zero vector, whose cosine is
    // engine-defined (Spark's cosineSim yields 0.0, DuckDB's
    // list_cosine_similarity NaN) — exclude them on BOTH sides so the
    // corpus is identical cross-engine
    val emb = docs
      .filter(length(col("text")) > 0)
      .select(col("doc_id").cast("long"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val h = new Array[Float](64)
        bytes.foreach(b => h((b & 0xff) >> 2) += 1f)
        (id, h)
      }
      .toDF("doc_id", "emb")
    val q = emb.filter(col("doc_id") < 10)
      .select(col("doc_id").as("q_id"), col("emb").as("q_emb"))
    graft.ann.Ann.poolTopK(
      emb.join(broadcast(q), col("doc_id") =!= col("q_id"))
        .withColumn("cos",
          graft.functions.GraftFunctions.cosineSim(col("emb"), col("q_emb")))
        .withColumn("cos_r", round(col("cos"), 6)),
      orderBy = Seq("cos_r" -> false, "doc_id" -> true),
      k = 5, rankName = "rank")
      .select(col("q_id"), col("doc_id").as("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** F4 `mm_dedup` — perceptual-bucket near-dup grouping for media
    * payloads: the stub decode signature (format, 32-px dimension
    * bands, 16-level mean-byte band) stands in for a perceptual hash;
    * payloads sharing a bucket are duplicate candidates (keep-min-id,
    * 10-member sample). Exact-byte dedup is mm_meta's sha256 — this is
    * the fuzzy tier above it, and the same group-on-signature shuffle
    * shape a real pHash would use. Buckets derive from [[mmFeatures]]'
    * already-oracled values, so the grouping replays exactly in SQL.
    */
  def mmDedup(spark: SparkSession, dir: String): DataFrame =
    mmDedupOf(Tables(spark, dir, "documents"))

  /** [[mmDedup]]'s kernel on any documents-shaped frame. */
  def mmDedupOf(docs: DataFrame): DataFrame =
    mmFeaturesOf(docs)
      .select(col("doc_id"), col("fmt"),
        floor(col("width") / 32).cast("int").as("wband"),
        floor(col("height") / 32).cast("int").as("hband"),
        floor(col("mean_byte") / 16).cast("int").as("mband"))
      .groupBy(col("fmt"), col("wband"), col("hband"), col("mband"))
      .agg(
        count(lit(1)).as("group_size"),
        min(col("doc_id")).as("keep_id"),
        array_join(slice(array_sort(collect_list(col("doc_id"))), 1, 10),
          ",").as("sample_ids"))
      .filter(col("group_size") >= 2)
      .orderBy(col("fmt"), col("wband"), col("hband"), col("mband"))

  /** Shared oracle fragment mirroring [[decodeHeader]]'s REACHABLE
    * arms over a `b(doc_id, n, bytes)` relation: GIF logical-screen
    * and WebP VP8X canvas dims byte-for-byte, then the stub fallback.
    * The PNG/JPEG arms are omitted ON PURPOSE — their signature bytes
    * (0x89 initial / any 0xFF) are unrepresentable in the UTF-8
    * `encode(text)` byte stream, so those branches can never fire on
    * the documents table (decodeHeader's doc states the argument);
    * GIF/WebP signatures are plain ASCII and CAN occur in text, so
    * they must (and do) replay exactly.
    */
  private def oracleDecode: String =
    """sig AS (SELECT *,
      |    n >= 10 AND bytes[1] = 71 AND bytes[2] = 73 AND bytes[3] = 70
      |      AND bytes[4] = 56 AND (bytes[5] = 55 OR bytes[5] = 57)
      |      AND bytes[6] = 97 AS is_gif,
      |    n >= 30 AND bytes[1] = 82 AND bytes[2] = 73 AND bytes[3] = 70
      |      AND bytes[4] = 70 AND bytes[9] = 87 AND bytes[10] = 69
      |      AND bytes[11] = 66 AND bytes[12] = 80 AND bytes[13] = 86
      |      AND bytes[14] = 80 AND bytes[15] = 56 AND bytes[16] = 88
      |      AS is_webpx
      |  FROM b),
      |d0 AS (SELECT *,
      |    CASE WHEN is_gif THEN 'gif' WHEN is_webpx THEN 'webp'
      |      ELSE CASE n % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
      |        ELSE 'webp' END END AS fmt,
      |    CASE WHEN is_gif THEN bytes[7] + bytes[8] * 256
      |      WHEN is_webpx
      |        THEN 1 + bytes[25] + bytes[26] * 256 + bytes[27] * 65536
      |      ELSE 64 + coalesce(bytes[1], 0) % 192 END AS width,
      |    CASE WHEN is_gif THEN bytes[9] + bytes[10] * 256
      |      WHEN is_webpx
      |        THEN 1 + bytes[28] + bytes[29] * 256 + bytes[30] * 65536
      |      ELSE 64 + coalesce(bytes[2], 0) % 192 END AS height
      |  FROM sig)""".stripMargin

  /** F8's signature + banded candidate replay (bytes -> stub pHash ->
    * four 16-bit bands -> candidate pairs `cand`) as a shared oracle
    * prefix for F8/F10.
    */
  private[multimodal] val phashCandOracleCte: String =
    s"""h AS (SELECT doc_id, hex(encode(text)) AS hx,
         |    octet_length(encode(text)) AS n FROM documents),
         |b AS (SELECT doc_id, n,
         |    [16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
         |      + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1
         |      for i in range(1, n + 1)] AS bytes
         |  FROM h),
         |ph AS (SELECT doc_id,
         |    (CAST(coalesce(bytes[1], 0) % 128 AS BIGINT) << 56)
         |    | (CAST(coalesce(bytes[(n * 1) // 8 + 1], 0) AS BIGINT) << 48)
         |    | (CAST(coalesce(bytes[(n * 2) // 8 + 1], 0) AS BIGINT) << 40)
         |    | (CAST(coalesce(bytes[(n * 3) // 8 + 1], 0) AS BIGINT) << 32)
         |    | (CAST(coalesce(bytes[(n * 4) // 8 + 1], 0) AS BIGINT) << 24)
         |    | (CAST(coalesce(bytes[(n * 5) // 8 + 1], 0) AS BIGINT) << 16)
         |    | (CAST(coalesce(bytes[(n * 6) // 8 + 1], 0) AS BIGINT) << 8)
         |    | CAST(coalesce(bytes[(n * 7) // 8 + 1], 0) AS BIGINT) AS ph
         |  FROM b),
         |bands AS MATERIALIZED (SELECT doc_id, ph, i AS band,
         |    (ph >> (16 * i)) & 65535 AS bv
         |  FROM ph, range(0, 4) r(i)),
         |cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib,
         |    a.ph AS pha, b.ph AS phb
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)"""
  // NOTE: deliberately NOT stripMargin'd — the `ph` CTE's bitwise-OR
  // lines start with a literal `|` after the margin, so the margins
  // must survive until the CONSUMING oracle entry's single stripMargin
  // (a second strip would eat the operators).

  // jump doubles covered distance: diameter ≤ 2^16. The unrolled
  // propagate+jump chain itself moved to graft.dedup.Dedup
  // (ccChainOracle/ccSentinelOracle) in r14 so graph_components /
  // dedup_clusters / graph_mst share the one implementation.
  val PhashCcRounds: Int = graft.dedup.Dedup.CcOracleRounds

  val oracle: Map[String, String] = Map(
    // F9: replay the per-stream greedy byte walk with a recursive CTE
    // (the C10 oracle shape, byte-budgeted), then the manifest md5
    // over the doc_id-ordered member list
    "mm_shard_pack" ->
      s"""WITH RECURSIVE
         |d AS (SELECT doc_id, doc_id % $ShardStreams AS pid,
         |    octet_length(encode(text)) AS n FROM documents),
         |o AS (SELECT *, row_number() OVER (PARTITION BY pid
         |    ORDER BY doc_id) AS rn FROM d),
         |walk(pid, rn, doc_id, n, shard, running) AS (
         |  SELECT pid, rn, doc_id, n, CAST(0 AS BIGINT),
         |    CAST(n AS BIGINT)
         |  FROM o WHERE rn = 1
         |  UNION ALL
         |  SELECT o.pid, o.rn, o.doc_id, o.n,
         |    CASE WHEN walk.running + o.n > $ShardBytes
         |      THEN walk.shard + 1 ELSE walk.shard END,
         |    CASE WHEN walk.running + o.n > $ShardBytes
         |      THEN CAST(o.n AS BIGINT) ELSE walk.running + o.n END
         |  FROM o JOIN walk ON o.pid = walk.pid AND o.rn = walk.rn + 1)
         |SELECT pid, shard AS shard_id, count(*) AS n_samples,
         |  CAST(sum(n) AS BIGINT) AS shard_bytes,
         |  md5(string_agg(CAST(doc_id AS VARCHAR), ':'
         |    ORDER BY doc_id)) AS ids_md5
         |FROM walk GROUP BY pid, shard
         |ORDER BY pid, shard_id""".stripMargin,
    // F8: hex-decode the payload bytes, replay the 8-byte big-endian
    // pack in exact integer arithmetic (bit shifts, NOT 65536**i —
    // DuckDB's ** returns double and loses bits past 2^53), then the
    // same band join + xor/bit_count verify
    // mm_phash_clusters: F8's candidate chain + Hamming threshold as
    // the edge list, resolved by the D6/D14 recursive reach
    // Round 12: the transitive-closure reach recursion was replaced by
    // unrolled min-label PROPAGATE + POINTER-JUMP rounds. The sf1-iso
    // phash stub produces a 28k-node cluster, and reach materializes
    // every (node, reachable-root) pair — O(component²) ≈ 8·10⁸ rows,
    // which wedged the full-registry sf1 gate (the r10 betweenness
    // class, CC flavor). Propagate keeps frames O(nodes); the jump
    // (lbl ← lbl-of-lbl) doubles covered distance per round, so
    // [[PhashCcRounds]] rounds cover diameter 2^rounds — far past any
    // component this corpus can hold. Non-convergence is loud, not
    // silent: an unconverged label disagrees with the Spark side and
    // fails the gate — and since r13 it is self-identifying: a final
    // lab_N ≠ lab_{N-1} probe emits a doc_id = -1 sentinel row, so an
    // under-unrolled oracle reads as "oracle needs more rounds", not
    // as a mystery label diff. Everything MATERIALIZED (§8m(d)).
    "mm_phash_clusters" ->
      s"""WITH $phashCandOracleCte,
         |prs AS MATERIALIZED (SELECT ia, ib FROM cand
         |  WHERE bit_count(xor(pha, phb)) <= $PhashMaxHamming),
         |edges AS MATERIALIZED (SELECT ia AS eu, ib AS ev FROM prs
         |  UNION SELECT ib, ia FROM prs),
         |${graft.dedup.Dedup.ccChainOracle(PhashCcRounds, "edges", "")}
         |SELECT node AS doc_id, lbl AS cluster_id,
         |  count(*) OVER (PARTITION BY lbl) AS cluster_size
         |FROM lab$PhashCcRounds
         |UNION ALL
         |SELECT -1, -1, -1
         |WHERE ${graft.dedup.Dedup.ccSentinelOracle(PhashCcRounds, "")}
         |ORDER BY doc_id""".stripMargin,
    "mm_phash_pairs" ->
      s"""WITH $phashCandOracleCte
         |SELECT ia, ib, CAST(bit_count(xor(pha, phb)) AS INT) AS hamming
         |FROM cand WHERE bit_count(xor(pha, phb)) <= $PhashMaxHamming
         |ORDER BY ia, ib""".stripMargin,
    // F7: same regex engine semantics both sides — maximal greedy runs
    // of the ASCII-printable class; payload bytes ARE the utf-8 text
    "mm_strings" ->
      """WITH r AS (SELECT doc_id,
        |    regexp_extract_all(text, '[ -~]{8,}') AS runs
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(runs) AS INT) AS n_runs,
        |  CAST(coalesce(list_sum([length(x) for x in runs]), 0) AS INT)
        |    AS extracted_chars,
        |  CASE WHEN len(runs) > 0 THEN runs[1][1:40] END AS first_run
        |FROM r ORDER BY doc_id""".stripMargin,
    "mm_dedup" ->
      s"""WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n
        |  FROM documents),
        |b AS (SELECT doc_id, n,
        |    [16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
        |      + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1
        |      for i in range(1, n + 1)] AS bytes
        |  FROM h),
        |$oracleDecode,
        |d AS (SELECT doc_id, fmt,
        |    CAST(width // 32 AS INT) AS wband,
        |    CAST(height // 32 AS INT) AS hband,
        |    CAST(floor(coalesce(round(list_avg(bytes), 4), 0.0) / 16)
        |      AS INT) AS mband
        |  FROM d0)
        |SELECT fmt, wband, hband, mband, count(*) AS group_size,
        |  min(doc_id) AS keep_id,
        |  array_to_string(list_sort(list(doc_id))[1:10], ',')
        |    AS sample_ids
        |FROM d GROUP BY 1, 2, 3, 4
        |HAVING count(*) >= 2
        |ORDER BY fmt, wband, hband, mband""".stripMargin,
    "mm_features" ->
      s"""WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n
        |  FROM documents),
        |b AS (SELECT doc_id, n,
        |    [16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
        |      + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1
        |      for i in range(1, n + 1)] AS bytes
        |  FROM h),
        |$oracleDecode,
        |r AS (SELECT *,
        |    64.0 / greatest(width, height) AS scale FROM d0)
        |SELECT doc_id, fmt, width, height,
        |  greatest(1, CAST(round(width * scale) AS INT)) AS out_w,
        |  greatest(1, CAST(round(height * scale) AS INT)) AS out_h,
        |  n AS n_bytes,
        |  coalesce(round(list_avg(bytes), 4), 0.0) AS mean_byte
        |FROM r ORDER BY doc_id""".stripMargin,
    "mm_frames" ->
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n
        |  FROM documents),
        |b AS (SELECT doc_id, n,
        |    [16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
        |      + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1
        |      for i in range(1, n + 1)] AS bytes
        |  FROM h),
        |f AS (SELECT doc_id, n, bytes, unnest(range(0, 4)) AS frame_idx
        |  FROM b),
        |w AS (SELECT doc_id, frame_idx,
        |    CAST((n * frame_idx) // 4 AS INT) AS off, n, bytes FROM f)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |  off AS "offset",
        |  greatest(least(off + 32, n) - off, 0) AS frame_bytes,
        |  coalesce(round(list_avg(
        |    list_slice(bytes, off + 1, least(off + 32, n))), 4), 0.0)
        |    AS mean_byte
        |FROM w ORDER BY doc_id, frame_idx""".stripMargin,
    // F5: byte decode via the hex trick; the WAV header arm mirrors
    // wavSamples byte-for-byte (RIFF magics are plain ASCII and the
    // fmt-chunk control bytes are valid UTF-8, so the arm is REACHABLE
    // from text — the GIF/WebP precedent applies and the mirror is
    // mandatory); then integer sum-of-squares per window — the
    // division and sqrt are the only floats, so the 4-dp round never
    // sits on a boundary
    "mm_audio_energy" ->
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n
        |  FROM documents),
        |rb AS (SELECT doc_id, n,
        |    [16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
        |      + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1
        |      for i in range(1, n + 1)] AS raw
        |  FROM h),
        |v AS (SELECT doc_id, n, raw,
        |    n >= 44 AND raw[1] = 82 AND raw[2] = 73 AND raw[3] = 70
        |      AND raw[4] = 70 AND raw[9] = 87 AND raw[10] = 65
        |      AND raw[11] = 86 AND raw[12] = 69 AND raw[13] = 102
        |      AND raw[14] = 109 AND raw[15] = 116 AND raw[16] = 32
        |      AND raw[17] = 16 AND raw[18] = 0 AND raw[19] = 0
        |      AND raw[20] = 0 AND raw[21] = 1 AND raw[22] = 0
        |      AND (raw[35] = 8 OR raw[35] = 16) AND raw[36] = 0
        |      AND raw[37] = 100 AND raw[38] = 97 AND raw[39] = 116
        |      AND raw[40] = 97 AS is_wav
        |  FROM rb),
        |d AS (SELECT doc_id, n, raw, is_wav,
        |    CASE WHEN is_wav THEN least(raw[41] + 256 * raw[42]
        |        + 65536 * raw[43] + 16777216 * raw[44], n - 44)
        |      ELSE n END AS ds
        |  FROM v),
        |b AS (SELECT doc_id,
        |    CASE WHEN NOT is_wav THEN [x - 128 for x in raw]
        |      WHEN raw[35] = 8
        |        THEN [raw[44 + i] - 128 for i in range(1, ds + 1)]
        |      ELSE [CASE WHEN raw[45 + 2*j] + 256 * raw[46 + 2*j] >= 32768
        |          THEN raw[45 + 2*j] + 256 * raw[46 + 2*j] - 65536
        |          ELSE raw[45 + 2*j] + 256 * raw[46 + 2*j] END
        |        for j in range(0, ds // 2)] END AS s
        |  FROM d),
        |w AS (SELECT doc_id, s, len(s) AS ns,
        |    unnest(range(0, (len(s) + 99) // 100)) AS win_idx
        |  FROM b),
        |sl AS (SELECT doc_id, win_idx,
        |    s[win_idx*100 + 1 : least((win_idx+1)*100, ns)] AS win
        |  FROM w)
        |SELECT doc_id, CAST(win_idx AS INT) AS win_idx,
        |  CAST(len(win) AS INT) AS n_samples,
        |  round(sqrt(CAST(list_sum([CAST(x*x AS BIGINT) for x in win])
        |    AS DOUBLE) / len(win)), 4) AS rms,
        |  CAST(list_max([abs(x) for x in win]) AS INT) AS peak
        |FROM sl ORDER BY doc_id, win_idx""".stripMargin,
    // F6: hex byte decode → 64-bucket histogram → the E1 cosine/rank
    // replay; histogram counts are integers, so the cosine matches to
    // the last bit before the guard rounds
    "mm_embed_topk" ->
      """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n
        |  FROM documents WHERE octet_length(encode(text)) > 0),
        |b AS (SELECT doc_id,
        |    [(16 * (strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1)) - 1)
        |      + strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 1) // 4
        |      for i in range(1, n + 1)] AS bk
        |  FROM h),
        |e AS (SELECT doc_id,
        |    [CAST(len(list_filter(bk, x -> x = k)) AS DOUBLE)
        |      for k in range(0, 64)] AS emb
        |  FROM b),
        |q AS (SELECT doc_id AS q_id, emb AS q_emb FROM e
        |  WHERE doc_id < 10),
        |scored AS (SELECT q.q_id, e.doc_id,
        |    list_cosine_similarity(e.emb, q.q_emb) AS cos
        |  FROM e CROSS JOIN q WHERE e.doc_id <> q.q_id),
        |ranked AS (SELECT q_id, doc_id, cos, row_number() OVER (
        |    PARTITION BY q_id ORDER BY round(cos, 6) DESC, doc_id)
        |      AS rank
        |  FROM scored)
        |SELECT q_id, doc_id AS neighbor_id, rank, round(cos, 4) AS cos
        |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
    "mm_meta" ->
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  sha256(text) AS sha256,
        |  CASE WHEN octet_length(encode(text)) >= 400 THEN 'large'
        |    WHEN octet_length(encode(text)) >= 200 THEN 'medium'
        |    ELSE 'small' END AS size_band
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
