package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._
import graft.text.TextOps
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

/** Deduplication operators (SURVEY.md §2.D) — the exact → fuzzy ladder a
  * training-data pipeline needs: content-hash dedup, n-gram Jaccard,
  * MinHash+LSH, SimHash, embedding near-dup.
  *
  * Scale shape (100 TB): never enumerate O(n²) pairs. Every fuzzy
  * variant generates candidates through an inverted index / LSH-band
  * shuffle keyed on (band, bucket) — join fan-out stays bounded by
  * bucket size — then verifies candidates exactly. The only quadratic
  * operator is `dedup_embedding`'s exact baseline, kept as the oracle
  * anchor for its LSH scale path `dedup_embedding_lsh`.
  */
object Dedup {

  /** Documents with whitespace tokens + distinct word-3-gram shingles.
    * The corpus ships as one file at test SFs → one scan split; spread
    * so the shingle/hash kernels use every core (per-row work dominates
    * the one small shuffle — the ANN-paths trade; a multi-file 100 TB
    * corpus splits naturally).
    */
  private[dedup] def shingled(spark: SparkSession, dir: String): DataFrame =
    shingledOf(Tables(spark, dir, "documents"))

  /** [[shingled]]'s kernel on any (doc_id, text) frame — the shared
    * front of the shingle-based dedup family.
    */
  def shingledOf(docs: DataFrame): DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("shingles", TextOps.wordShingles(col("toks")))

  /** D1 `dedup_exact` — exact dedup by normalized content hash: one row
    * per doc with its canonical keeper (min doc_id in the hash group).
    * Single hash-shuffle on the fingerprint; at scale this is the
    * classic first-pass dedup (group sizes are tiny, no skew).
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    exactDups(Tables(spark, dir, "documents"))

  /** [[dedupExact]]'s kernel on any (doc_id, text) frame. */
  def exactDups(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    docs
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .withColumn("group_size", count(lit(1)).over(w))
      .select(col("doc_id"), col("fp"), col("keep_id"),
        (col("doc_id") =!= col("keep_id")).cast("int").as("is_dup"),
        col("group_size"))
      .orderBy(col("doc_id"))
  }

  /** D11 `dedup_by_source` — WHERE duplication concentrates: D1's
    * exact-dedup rule rolled up per source — the report a curation
    * pipeline acts on (a source shedding half its docs to dedup gets
    * its crawler fixed or its mixture weight cut, a decision the
    * corpus-wide rate averages away). Same single fp-keyed window as
    * D1 (fingerprint groups span sources, so the keep-min-id rule
    * charges the duplicate to the source that contributed the LATER
    * copy), then one O(sources) rollup; dup share in exact basis
    * points (floor division, the house float-free ratio rule).
    */
  def dedupBySource(spark: SparkSession, dir: String): DataFrame =
    dupsBySource(Tables(spark, dir, "documents"))

  /** [[dedupBySource]]'s kernel on any (doc_id, text, source) frame. */
  def dupsBySource(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("fp"))
    docs
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withColumn("is_dup",
        (col("doc_id") =!= min(col("doc_id")).over(w)).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("is_dup")).as("n_dups"))
      .withColumn("dup_bp", expr("n_dups * 10000 div n_docs"))
      .orderBy(col("source"))
  }

  /** Shingle doc-frequency cap: shingles present in more than this many
    * docs are "stop-shingles" — dropped from the similarity universe.
    * Controls inverted-index fan-out: a shingle in m docs creates m²
    * candidate pairs, so the cap bounds per-bucket join cost at scale.
    */
  val MaxShingleDf = 50

  /** D2/D3/D6 near-dup bar: exact 3-gram Jaccard at-or-above this
    * keeps a pair. Interpolated into the oracles (r14 — the band-
    * geometry ADVICE applied to the remaining shared constants), so
    * moving the bar moves both engines together.
    */
  val NearDupTau = 0.5

  /** D2 `dedup_ngram_jaccard` — near-dup pairs with exact 3-gram
    * Jaccard ≥ 0.5, via inverted index (shingle → docs) self-join:
    * shuffle on shingle, pair counting on (ia, ib) — no cartesian.
    *
    * Plan shape matters here: df-cap and per-doc sizes are computed
    * with windows on ONE exploded subtree (instead of groupBy+join
    * back), and the self-join's two sides are the same plan — so the
    * scan/shingle/explode work runs once and the shingle shuffle is a
    * ReusedExchange, not a recompute. The naive spelling scanned the
    * corpus 8×.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    dedupNgramJaccardOf(Tables(spark, dir, "documents"))

  /** [[dedupNgramJaccard]]'s kernel on any (doc_id, text) frame. */
  def dedupNgramJaccardOf(docs: DataFrame): DataFrame =
    ngramJaccardPairsOf(shingledOf(docs), materialize = true)

  /** n-gram Jaccard pair engine behind D2/D6. ONE wide shuffle: the
    * df-cap window partitions the exploded (doc, shingle) rows by
    * shingle — exactly the partitioning the self-join needs — and
    * per-doc sizes come from a small aggregate joined onto the PAIR
    * frame, replacing a second full-width per-doc window.
    *
    * `materialize` controls an eager localCheckpoint of the exploded
    * frame: Catalyst's stats estimate the windowed side as
    * broadcastable, which would recompute the scan→shingle→explode→
    * window subtree for the join's build side AND the size branch —
    * three full passes. Standalone callers want it (D2); callers that
    * checkpoint the downstream result themselves (D6's edge set) skip
    * it, because stacking two materialization barriers costs more than
    * the recompute it saves.
    */
  private def ngramJaccardPairs(spark: SparkSession, dir: String,
      materialize: Boolean): DataFrame =
    ngramJaccardPairsOf(shingled(spark, dir), materialize)

  /** Same pair engine over ANY (doc_id, shingles) frame — lets pipeline
    * compositions (A16 corpus_pipeline) run near-dup detection on an
    * already-filtered corpus instead of the raw table.
    */
  def ngramJaccardPairsOf(docs: DataFrame, materialize: Boolean): DataFrame = {
    val wg = Window.partitionBy(col("g"))
    val ex0 = docs
      .select(col("doc_id"), explode(col("shingles")).as("gs"))
      // shingles enter the wide shuffle as 8-byte hashes, not ~25-byte
      // strings: the df-cap window, the self-join exchange, and the
      // join hash tables all shrink ~3×; set-equality semantics are
      // unchanged (64-bit collisions are ~(distinct²/2^65) — nil here)
      .select(col("doc_id"), xxhash64(col("gs")).as("g"))
      .withColumn("df", count(lit(1)).over(wg))
      .filter(col("df") <= MaxShingleDf) // df-capped universe
      .select(col("doc_id"), col("g"))
    val ex = if (materialize) ex0.localCheckpoint(true, MEMORY_AND_DISK_SER) else ex0
    val sz = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    ex.as("a")
      .join(ex.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .agg(count(lit(1)).as("n_common"))
      .join(sz.select(col("doc_id").as("ia"), col("n_sh").as("na")), "ia")
      .join(sz.select(col("doc_id").as("ib"), col("n_sh").as("nb")), "ib")
      .withColumn("jaccard",
        col("n_common") / (col("na") + col("nb") - col("n_common")))
      .filter(round(col("jaccard"), 6) >= NearDupTau)
      .select(col("ia"), col("ib"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("ia"), col("ib"))
  }

  val NumPerms = 128
  val NumBands = 32 // 4 rows per band → P(candidate) = 1-(1-j^4)^32

  /** D3 `dedup_minhash_lsh` — MinHash signatures (one-pass custom
    * expression) + banded LSH: docs sharing any band bucket become
    * candidates, candidates are verified with exact Jaccard ≥ 0.5.
    * The shuffle key is (band, band-slice): 4 longs per band regardless
    * of document length — this is the 100 TB dedup path. The slice
    * itself (not a hash of it) is the key so candidate generation is
    * bit-reproducible in any engine — that's what lets the DuckDB
    * oracle replay this pipeline end-to-end; hashing the slice to 8
    * bytes would shave the shuffle but make candidates depend on the
    * engine's hash function.
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    dedupMinhashLshOf(Tables(spark, dir, "documents"))

  /** [[dedupMinhashLsh]]'s kernel on any (doc_id, text) frame. */
  def dedupMinhashLshOf(docs: DataFrame): DataFrame =
    minhashLshPairs(shingledOf(docs))

  /** [[dedupMinhashLsh]]'s kernel on any (doc_id, shingles) frame
    * (see [[shingledOf]]).
    */
  def minhashLshPairs(shingledDocs: DataFrame): DataFrame = {
    val rows = NumPerms / NumBands
    // materialize signatures once: the band explode and BOTH verify
    // joins read this frame, and only the two band-join sides would be
    // deduplicated by ReuseExchange — without the checkpoint the
    // 128-perm minhash kernel runs ~3× over the corpus
    val sig = shingledDocs
      .select(col("doc_id"), col("shingles"),
        minhashSig(col("shingles"), NumPerms).as("sig"))
      .localCheckpoint(true, MEMORY_AND_DISK_SER)
    val bands = sig.select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, $NumBands - 1), " +
            s"b -> slice(sig, b * $rows + 1, $rows))"))
          .as(Seq("band", "bucket")))
    val cand = bands.select(col("doc_id").as("ia"), col("band"), col("bucket"))
      .join(bands.select(col("doc_id").as("ib"), col("band"), col("bucket")),
        Seq("band", "bucket"))
      .filter(col("ia") < col("ib"))
      .select("ia", "ib").distinct()
    val docs = sig.select(col("doc_id"), col("shingles"))
    cand
      .join(docs.select(col("doc_id").as("ia"), col("shingles").as("sha")), "ia")
      .join(docs.select(col("doc_id").as("ib"), col("shingles").as("shb")), "ib")
      .withColumn("jaccard", jaccardSim(col("sha"), col("shb")))
      .filter(round(col("jaccard"), 6) >= NearDupTau)
      .select(col("ia"), col("ib"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("ia"), col("ib"))
  }

  val FuzzyContamTau = 0.5 // D3's near-dup bar, applied corpus↔eval

  /** C44 `decontaminate_fuzzy` — MinHash-Jaccard eval-overlap
    * decontamination: the fuzzy tier beside C12's exact 4-gram gate
    * (the standard production pairing — the GPT-3/Llama appendix
    * method: exact n-gram overlap catches verbatim leakage, a
    * near-dup Jaccard pass catches the PARAPHRASED eval item whose
    * scattered token edits break every long n-gram while the doc is
    * still ~the benchmark answer). D3's signature kernel verbatim
    * (128-perm MinHash, 32-band LSH on 3-gram shingles) with the
    * join made bipartite — corpus bands probe the EVAL side's bands —
    * and C41's report shape: one row per held-out doc, how many
    * training docs sit above [[FuzzyContamTau]] Jaccard, and the
    * worst offender's similarity.
    *
    * Scale shape: a REAL eval set is small and its band frame
    * broadcasts — but this query's stand-in split (doc_id %
    * ContamMod) grows linearly with the corpus, so the join is left
    * UN-hinted (r13): the planner broadcasts under the threshold and
    * degrades to a shuffle equi join on (band, bucket) above it, the
    * same transition PlanSpec pins for dedup_minhash_lsh. Either way
    * the only shuffles carry band rows and candidate pairs (rare)
    * plus the O(eval docs) rollup — never corpus payloads.
    * Verification joins shingle sets for candidates only.
    */
  def decontaminateFuzzy(spark: SparkSession, dir: String): DataFrame =
    decontaminateFuzzyOf(Tables(spark, dir, "documents"))

  /** [[decontaminateFuzzy]]'s kernel on any (doc_id, text) frame. */
  def decontaminateFuzzyOf(docs: DataFrame): DataFrame =
    decontaminateFuzzyDocs(shingledOf(docs))

  /** [[decontaminateFuzzy]]'s kernel on any (doc_id, shingles) frame
    * (bench membership = doc_id % ContamMod, C12's split).
    */
  def decontaminateFuzzyDocs(docs: DataFrame): DataFrame = {
    import graft.text.TextOps.ContamMod
    val rows = NumPerms / NumBands
    val sig = docs
      .select(col("doc_id"), col("shingles"),
        minhashSig(col("shingles"), NumPerms).as("sig"))
      .localCheckpoint(true, MEMORY_AND_DISK_SER) // bands + both verify joins + the base frame
    val bands = sig.select(col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, $NumBands - 1), " +
          s"b -> slice(sig, b * $rows + 1, $rows))"))
        .as(Seq("band", "bucket")))
    val bench = bands.filter(pmod(col("doc_id"), lit(ContamMod)) === 0)
      .select(col("doc_id").as("bench_id"), col("band"), col("bucket"))
    val corpus = bands.filter(pmod(col("doc_id"), lit(ContamMod)) =!= 0)
      .select(col("doc_id").as("cdoc"), col("band"), col("bucket"))
    // no broadcast() hint (r13 ADVICE fix): in THIS query's split the
    // eval side is doc_id % ContamMod — a fixed 1/ContamMod of the
    // corpus × NumBands rows, so it grows linearly with corpus size
    // and a forced broadcast would OOM at the 100 TB target. Let the
    // planner pick: broadcast while the band frame fits under the
    // threshold, degrade to a shuffle equi join above it (the same
    // transition PlanSpec pins for dedup_minhash_lsh). A deployment
    // with a genuinely fixed eval set can still hint its own frame.
    val cand = corpus.join(bench, Seq("band", "bucket"))
      .select(col("cdoc"), col("bench_id")).distinct()
    val verified = cand
      .join(sig.select(col("doc_id").as("cdoc"), col("shingles").as("shc")),
        "cdoc")
      .join(sig.select(col("doc_id").as("bench_id"),
        col("shingles").as("shb")), "bench_id")
      .withColumn("jaccard", jaccardSim(col("shc"), col("shb")))
      .filter(round(col("jaccard"), 6) >= FuzzyContamTau)
    val hits = verified.groupBy(col("bench_id"))
      .agg(count(lit(1)).as("n_contam_docs"),
        max(round(col("jaccard"), 4)).as("max_jaccard"))
    sig.filter(pmod(col("doc_id"), lit(ContamMod)) === 0)
      .select(col("doc_id").as("bench_id"))
      .join(hits, Seq("bench_id"), "left")
      .na.fill(0L, Seq("n_contam_docs"))
      .na.fill(0.0, Seq("max_jaccard"))
      .orderBy(col("bench_id"))
  }

  val SimhashMaxHamming = 3

  /** D4 `dedup_simhash` — 64-bit SimHash near-dup pairs. Banding on the
    * four 16-bit chunks guarantees (pigeonhole) that every pair within
    * hamming ≤ 3 shares at least one exact chunk, so candidate
    * generation is a plain equality join; verification is native
    * `bit_count(a ^ b)` in codegen.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    simhashPairs(Tables(spark, dir, "documents"))

  /** [[dedupSimhash]]'s kernel on any (doc_id, text) frame. */
  def simhashPairs(docs: DataFrame): DataFrame = {
    // spread the single-split scan BEFORE signature compute + chunk
    // posexplode so both Generate passes run on every core (round-4
    // rule); the two self-join sides share the exchange via
    // ReusedExchange, so the corpus is still hashed exactly once.
    val sig = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        simhash64(TextOps.tokens(col("text"))).as("sig"))
    val chunks = sig.select(col("doc_id"), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), j -> (sig >> (j * 16)) & 65535)"))
        .as(Seq("chunk_idx", "chunk")))
    val cand = chunks
      .select(col("doc_id").as("ia"), col("sig").as("siga"),
        col("chunk_idx"), col("chunk"))
      .join(chunks.select(col("doc_id").as("ib"), col("sig").as("sigb"),
        col("chunk_idx"), col("chunk")), Seq("chunk_idx", "chunk"))
      .filter(col("ia") < col("ib"))
      .select("ia", "ib", "siga", "sigb").distinct()
    cand
      .withColumn("hamming",
        bit_count(col("siga").bitwiseXOR(col("sigb"))))
      .filter(col("hamming") <= SimhashMaxHamming)
      .select(col("ia"), col("ib"), col("hamming"))
      .orderBy(col("ia"), col("ib"))
  }

  val EmbDupTau = 0.4

  /** Corpus-size bound for D5's exact all-pairs arm (round 11,
    * verdict #3): at or below it the quadratic scan is affordable and
    * provably exact — the oracle anchor regime every test SF sits in;
    * above it [[dedupEmbedding]] transparently switches to the
    * cell-restricted scan ([[graft.ann.Ann.cellCosPairs]], D9's plan
    * shape) with the same (ia, ib, cos) contract — the runtime
    * size-gate [[connectedComponents]] already set the pattern for,
    * so no 100× deployment can leave the quadratic arm on by mistake.
    */
  val EmbExactMaxVectors = 65536L

  /** D5 `dedup_embedding` — embedding near-dup pairs (cosine ≥ τ),
    * SIZE-GATED: the exact block self-join at or below
    * [[EmbExactMaxVectors]] vectors (exact-by-construction, the
    * oracle anchor), the coarse-cell-restricted scan above it
    * (recall-bounded, shuffles on cell_id only). [[dedupEmbeddingLsh]]
    * remains the high-τ scale path when LSH recall suffices.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    embeddingDupPairs(Tables(spark, dir, "embeddings"))

  /** [[dedupEmbedding]]'s kernel on any (vec_id, embedding) frame:
    * cosine-τ near-dup pairs, size-gated between the exact all-pairs
    * arm and the cell-restricted scan.
    */
  def embeddingDupPairs(em: DataFrame,
      exactMax: Long = EmbExactMaxVectors): DataFrame =
    dedupEmbeddingGated(em.sparkSession, em, exactMax)

  /** [[dedupEmbedding]]'s gated kernel, bound parameterized so the
    * spec can force the above-bound arm on a small corpus.
    */
  private[graft] def dedupEmbeddingGated(spark: SparkSession,
      em0: DataFrame, exactMax: Long = EmbExactMaxVectors): DataFrame =
    if (em0.select(col("vec_id")).count() <= exactMax)
      dedupEmbeddingExact(em0)
    else graft.ann.Ann.cellCosPairs(spark, em0, EmbDupTau)
      .orderBy(col("ia"), col("ib"))

  /** The exact all-pairs arm on a `(vec_id, embedding)` frame. */
  private[graft] def dedupEmbeddingExact(em0: DataFrame): DataFrame = {
    // Hoist each vector's norm to a once-per-ROW projection so the
    // O(n²) stage only does the dot product — 1/3 of cosine_sim's
    // per-pair work, bit-identical result (dot and norms accumulate in
    // the same order as the fused kernel, just factored).
    val em = em0
      .select(col("vec_id"), col("embedding"),
        sqrt(dotF(col("embedding"), col("embedding"))).as("nrm"))
    // single-file scans arrive as one split; spread the stream side so
    // the O(n²) verify runs on every core, not one. The partition count
    // must be explicit: a bare repartition() is AQE-coalesced back to
    // ~one partition at this input size, serializing the quadratic
    // stage (observed: 5 tasks total on 32 cores).
    val p = em.sparkSession.sparkContext.defaultParallelism
    em.select(col("vec_id").as("ia"), col("embedding").as("ea"),
        col("nrm").as("na"))
      .repartition(p)
      .join(em.select(col("vec_id").as("ib"), col("embedding").as("eb"),
        col("nrm").as("nb")),
        col("ia") < col("ib"))
      .withColumn("cos",
        when(col("na") * col("nb") === 0.0, 0.0)
          .otherwise(dotF(col("ea"), col("eb")) / (col("na") * col("nb"))))
      .filter(round(col("cos"), 6) >= EmbDupTau)
      .select(col("ia"), col("ib"), round(col("cos"), 4).as("cos"))
      .orderBy(col("ia"), col("ib"))
  }

  val RhpBitsPerTable = 8
  val RhpTables = 16
  val EmbLshTau = 0.9

  /** D5b `dedup_embedding_lsh` — the scale path for embedding dedup:
    * random-hyperplane signatures over `RhpTables` independent tables;
    * vectors sharing a table signature become candidates (shuffle keyed
    * on (table, signature) — bounded buckets), then exact cosine ≥ 0.9
    * verification. Tuned for the high-τ near-dup regime where LSH
    * recall is sharp; see the spec for measured recall on planted dups.
    */
  def dedupEmbeddingLsh(spark: SparkSession, dir: String): DataFrame =
    embeddingLshPairs(
      Tables(spark, dir, "embeddings").select(col("vec_id"), col("embedding")),
      EmbLshTau)

  /** LSH candidate pairs + exact verify at threshold τ, reusable on any
    * (vec_id, embedding) frame.
    */
  def embeddingLshPairs(em: DataFrame, tau: Double): DataFrame = {
    // Proxy join (r15 opt; guide §8): the 512-byte embedding arrays
    // used to ride BOTH sides of the bucket self-join and the
    // candidate distinct hashed them per collision — the old plan's
    // two dominant stages. Signatures decide WHICH pairs to verify on
    // (id, table, sig) rows alone; the embeddings re-attach by key
    // exactly once per side for the exact verify. The signature frame
    // checkpoints because both self-join sides read it — uncached,
    // the 256-dot rhp projection per vector runs twice. Same
    // candidate set (ea/eb are functions of ia/ib, so the old
    // distinct over (ia, ib, ea, eb) equals distinct over (ia, ib)),
    // same cosines, same output. The re-attach legs assume vec_id is
    // UNIQUE in `em` (true for every caller — the embeddings table
    // keys on it); a duplicated id would multiply candidate rows that
    // the old (ia, ib, ea, eb) distinct collapsed (r15 ADVICE).
    val sigs = em.select(col("vec_id"),
      posexplode(rhpSigs(col("embedding"), RhpBitsPerTable, RhpTables))
        .as(Seq("table", "sig")))
      .localCheckpoint(true, MEMORY_AND_DISK_SER)
    val cand = sigs
      .select(col("vec_id").as("ia"), col("table"), col("sig"))
      .join(sigs.select(col("vec_id").as("ib"), col("table"),
        col("sig")), Seq("table", "sig"))
      .filter(col("ia") < col("ib"))
      .select("ia", "ib").distinct()
    cand
      .join(em.select(col("vec_id").as("ia"), col("embedding").as("ea")),
        Seq("ia"))
      .join(em.select(col("vec_id").as("ib"), col("embedding").as("eb")),
        Seq("ib"))
      .withColumn("cos", cosineSim(col("ea"), col("eb")))
      .filter(round(col("cos"), 6) >= tau)
      .select(col("ia"), col("ib"), round(col("cos"), 4).as("cos"))
      .orderBy(col("ia"), col("ib"))
  }

  /** Random-hyperplane signatures for all tables as array<long>. */
  def rhpSigs(emb: Column, bits: Int, tables: Int): Column =
    graft.functions.GraftFunctions.rhpSigs(emb, bits, tables)

  /** Edge count below which the component graph is resolved with
    * driver-side union-find instead of iterative Spark rounds. Dedup
    * edge lists are ≪ corpus size (they only contain flagged pairs), so
    * in practice this path almost always applies; 5M edges ≈ 80 MB on
    * the driver.
    */
  val CcDriverMaxEdges = 5000000L

  /** Checkpoint cadence for the distributed CC loop: the label frame
    * materializes (serialized localCheckpoint) every k-th round, with
    * intermediate rounds kept as LAZY lineage and the convergence agg
    * evaluated only at checkpoint rounds (a fixpoint is
    * propagation-invariant, so up to k−1 redundant no-op rounds may
    * run past convergence — results unchanged). k = 1 is today's
    * behavior (the oracle-gated default); the SPARK_GRAFT_CC_K knob
    * exists for the §9g factor-100 A/B probe — per-round checkpoint
    * re-reads are the link family's residual input term, and k > 1
    * trades them for recompute of the in-between joins. Adopt a new
    * default only on probe evidence (≥2x input cut at flat wall).
    */
  private[graft] val CcCheckpointEvery: Int =
    sys.env.get("SPARK_GRAFT_CC_K").map(_.toInt).getOrElse(1)

  /** Connected components over an undirected edge list (cols `u`, `v`):
    * every node's label converges to the smallest reachable node id.
    *
    * Hybrid execution, sized at runtime:
    *  - edge set ≤ [[CcDriverMaxEdges]] (the normal dedup case — edges
    *    are flagged PAIRS, orders of magnitude smaller than the corpus):
    *    collect and run path-compressed union-find on the driver,
    *    O(E α(E)) with zero extra shuffles;
    *  - larger graphs: iterative min-label propagation — one
    *    (edges ⋈ labels) shuffle + min-combine per round, rounds =
    *    component diameter, `localCheckpoint` truncating lineage so
    *    round N doesn't replay rounds 1..N-1.
    */
  def connectedComponents(edges0: DataFrame, maxIters: Int = 50,
      driverMaxEdges: Long = CcDriverMaxEdges,
      checkpointEvery: Int = CcCheckpointEvery): DataFrame = {
    val spark = edges0.sparkSession
    import spark.implicits._
    // the probe below materializes the bound as an Int limit
    // (0 = "never take the driver arm", the spec's forcing value)
    require(driverMaxEdges >= 0 && driverMaxEdges < Int.MaxValue,
      s"driverMaxEdges must be in [0, Int.MaxValue), got $driverMaxEdges")
    // all CC-kernel checkpoints store SERIALIZED (r14): per-round
    // lineage truncation means every frame is re-read next round, and
    // the factor-100 link probe measured the deserialized re-reads as
    // the queries' dominant task input (two-long rows triple in size
    // deserialized)
    val edges = edges0.select(col("u").cast("long"), col("v").cast("long"))
      .distinct()
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    // Tiered limit-probe gate (r12 one-job probe + r13 ADVICE fix):
    // tier 1 collects only SmallCap+1 rows — for the common small
    // graph that single job already delivers the full edge set, and
    // for a big graph it caps the driver transfer at ~64k tuples
    // instead of driverMaxEdges (~5M, ~200 MB). Only the mid tier
    // (SmallCap < edges ≤ driverMaxEdges) pays a second collect; the
    // over-bound tier answers from a 1-row count over the same
    // geometric CollectLimit prefix, no full pass, no bulk transfer.
    val SmallCap = 1 << 16
    val tier1 = edges.limit(math.min(SmallCap, driverMaxEdges.toInt) + 1)
      .as[(Long, Long)].collect()
    val probe: Array[(Long, Long)] =
      if (tier1.length <= math.min(SmallCap, driverMaxEdges.toInt)) tier1
      else if (edges.limit(driverMaxEdges.toInt + 1).count()
          <= driverMaxEdges)
        edges.limit(driverMaxEdges.toInt).as[(Long, Long)].collect()
      else Array.empty // over bound: distributed arm (probe unused)
    // driverMaxEdges == 0 means "never take the driver arm" (the spec's
    // forcing value) — honor it even for an empty edge set, where
    // tier1.isEmpty would otherwise route to the driver (r14 ADVICE).
    if (driverMaxEdges > 0 && (probe.nonEmpty || tier1.isEmpty)) {
      val pairs = probe
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.foreach { case (u, v) =>
        parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
      }
      parent.keys.toSeq.map(n => (n, find(n))).toDF("node", "label")
    } else {
      val sym = edges
        .union(edges.select(col("v").as("u"), col("u").as("v")))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      var labels = sym.select(col("u").as("node")).distinct()
        .withColumn("label", col("node"))
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < maxIters) {
        // cadence: materialize + test convergence only at every
        // checkpointEvery-th round; in between the round stays lazy
        // lineage (see CcCheckpointEvery)
        val cpRound = checkpointEvery <= 1 ||
          iter % checkpointEvery == checkpointEvery - 1 ||
          iter == maxIters - 1
        val nbrMin = sym.join(labels, sym("v") === labels("node"))
          .groupBy(sym("u")).agg(min(col("label")).as("nbr_min"))
        val next0 = labels.join(nbrMin, labels("node") === nbrMin("u"), "left")
          .select(col("node"),
            least(col("label"), coalesce(col("nbr_min"), col("label")))
              .as("label"),
            coalesce((col("nbr_min") < col("label")).cast("long"), lit(0L))
              .as("chg"))
        // r16: LAZY checkpoint — the convergence agg right below is the
        // action that materializes the blocks, fusing what used to be
        // two jobs per checkpoint round (persist pass + count pass)
        // into one. Same storage level, same lineage truncation.
        val next =
          if (cpRound)
            next0.localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
          else next0
        // coalesce: sum over an EMPTY label frame is NULL (reachable
        // since r14's driverMaxEdges=0 forcing covers empty graphs)
        if (cpRound)
          changed = next.agg(coalesce(sum(col("chg")), lit(0L)))
            .head().getLong(0)
        // pointer jumping (Shiloach–Vishkin shortcutting; round 12):
        // label(u) ← label(label(u)) — one O(nodes) equi self-join
        // that halves remaining chain depth per round, turning the
        // O(diameter) propagation into O(log diameter) rounds on the
        // path/skew graphs where the r11 verdict flagged the kernel's
        // serialized job chain. Labels only decrease toward the same
        // min-reachable fixpoint (label values ARE node ids present in
        // the frame), and a propagation fixpoint is jump-invariant, so
        // the convergence test above is unaffected.
        val cur = next.select(col("node"), col("label"))
        val jumped =
          if (changed == 0) cur
          else {
            val j = cur
              .join(cur.select(col("node").as("jn"), col("label").as("jl")),
                col("label") === col("jn"), "left")
              .select(col("node"), coalesce(col("jl"), col("label"))
                .as("label"))
            // lazy for the same reason: the next round's first join
            // (or the caller's final action) materializes the blocks —
            // an eager pass here would compute them only to have the
            // consumer re-read what it could have produced in-line
            if (cpRound)
              j.localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
            else j
          }
        labels = jumped
        iter += 1
      }
      require(changed == 0,
        s"connectedComponents: no convergence in $maxIters rounds")
      labels
    }
  }

  /** D6 `dedup_clusters` — duplicate CLUSTERS, not just pairs: the
    * union of exact-fingerprint star edges and n-gram-Jaccard near-dup
    * pairs, resolved into connected components so one keeper per
    * transitive group survives (A near B, B near C ⇒ {A,B,C} is one
    * cluster even when A–C alone misses the threshold). This is the
    * step that turns pairwise dedup signals into actual drop decisions
    * in a corpus pipeline.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    clustersOf(Tables(spark, dir, "documents"))

  /** [[dedupClusters]]'s kernel on any (doc_id, text) frame. */
  def clustersOf(docs: DataFrame): DataFrame = {
    val wfp = Window.partitionBy(col("fp"))
    val exact = docs
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .select(min(col("doc_id")).over(wfp).as("u"), col("doc_id").as("v"))
      .filter(col("u") < col("v"))
    val fuzzy = ngramJaccardPairsOf(shingledOf(docs), materialize = false)
      .select(col("ia").as("u"), col("ib").as("v"))
    val labels = connectedComponents(exact.union(fuzzy))
    val wc = Window.partitionBy(col("cluster_id"))
    labels
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(wc))
      .orderBy(col("doc_id"))
  }

  val SegTokens = 16 // fixed segmentation width for dedup_segments

  /** D7 `dedup_segments` — segment-level corpus dedup (the
    * paragraph-dedup / CCNet shape, with deterministic fixed-width
    * segmentation standing in for paragraph breaks — this corpus has
    * no newlines): each doc splits into consecutive [[SegTokens]]-token
    * segments, segments hash and group CORPUS-WIDE, and within each
    * hash group only the lexicographically-first (doc_id, seg_id) slot
    * survives. Reports per-doc segment counts and the kept fraction —
    * the signal both for pruning boilerplate segments and for dropping
    * mostly-duplicated docs. Scale shape: the corpus-wide exchanges
    * key on the segment hash (groupBy + join back, bucket-bounded
    * fan-out); the rollup re-shuffles only O(segments) rows, and no
    * stage ever holds a doc pair.
    */
  def dedupSegments(spark: SparkSession, dir: String): DataFrame =
    segmentDedup(Tables(spark, dir, "documents"))

  /** [[dedupSegments]]'s kernel on any (doc_id, text) frame. */
  def segmentDedup(docs: DataFrame): DataFrame = {
    val segs = docs
      .withColumn("w", TextOps.tokens(col("text")))
      .withColumn("seg_id", explode(sequence(lit(0),
        ceil(size(col("w")) / lit(SegTokens.toDouble)).cast("int") - 1)))
      .select(col("doc_id"), col("seg_id"),
        md5(array_join(slice(col("w"), col("seg_id") * SegTokens + 1,
          lit(SegTokens)), " ")).as("seg_fp"))
    val groups = segs.groupBy(col("seg_fp"))
      .agg(min(struct(col("doc_id"), col("seg_id"))).as("keep"))
    segs.join(groups, Seq("seg_fp"))
      .withColumn("is_dup",
        (!(col("doc_id") === col("keep.doc_id") &&
          col("seg_id") === col("keep.seg_id"))).cast("int"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("is_dup")).as("n_dup_segments"))
      .withColumn("kept_frac", round(
        (col("n_segments") - col("n_dup_segments")) * 1.0 /
          col("n_segments"), 4))
      .orderBy(col("doc_id"))
  }

  val SubTokens = 16 // sliding window width (D7's segment width, unaligned)

  /** D12 `dedup_substring` — EXACT-substring dedup by sliding-window
    * fingerprinting (the Lee et al. "Deduplicating Training Data Makes
    * Language Models Better" recipe production corpora pair with
    * MinHash, re-expressed for Spark: corpus-wide window-hash groups
    * instead of a distributed suffix array). D7's aligned segments
    * miss any shared span that crosses a 16-token boundary at an
    * offset — two docs sharing a SHIFTED 50-token run dedup to
    * nothing there (spec plants exactly that). Here EVERY w-token
    * window slides by 1: any shared ≥w-token run produces equal
    * windows in both docs regardless of alignment.
    *
    * Mechanics: per doc, [[graft.functions.RollingWinHashes]] emits
    * all window hashes in O(n + windows) via the Karp–Rabin rolling
    * decomposition (NOT the O(n·w) per-window digest — at 100 TB
    * that's w× the corpus bytes re-hashed); windows group corpus-wide
    * on the 8-byte hash; a window occurring ≥2 times anywhere (other
    * docs or a repeat in the same doc) is a duplicated span witness;
    * per doc the duplicated token coverage is the interval UNION of
    * its dup windows — one ordered window pass per doc (prev-end
    * running max, the B16 sessionize trick), never materializing the
    * w-row fan-out.
    *
    * Scale shape: the corpus-wide exchange carries (hash, doc, pos) =
    * O(tokens) rows of ~24 bytes keyed on the hash — the same bucket
    * discipline as D7, no doc pair ever held; the per-doc pass
    * re-shuffles only dup-window rows. The per-doc stats branch is a
    * second column-pruned scan that joins the O(docs) dup rollup by
    * broadcast. The ORACLE groups on the literal window STRING —
    * greener than replaying the fold: a Spark-side hash collision
    * would flip the counts and fail the gate, so the gate itself
    * certifies collision-freeness on the corpus (window-hash ≡
    * window-string grouping), cf. aiesec.py:139's row-identity
    * fingerprint generalized to span identity.
    */
  def dedupSubstring(spark: SparkSession, dir: String): DataFrame =
    substringDedup(Tables(spark, dir, "documents"))

  /** [[dedupSubstring]]'s kernel on any (doc_id, text) frame. */
  def substringDedup(docs: DataFrame): DataFrame = {
    val w = SubTokens
    val wins = docs
      .select(col("doc_id"),
        posexplode(rollingWinHashes(col("text"), w)).as(Seq("pos", "wh")))
    val dups = wins
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("wh"))))
      .filter(col("c") >= 2)
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val perDoc = dups
      .withColumn("prev_end", max(col("pos") + w).over(wDoc))
      .withColumn("cov",
        col("pos") + w -
          greatest(col("pos"), coalesce(col("prev_end"), col("pos"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_windows"),
        sum(col("cov")).as("dup_tokens"))
    docs
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("n_windows",
        greatest(col("n_tokens") - (w - 1), lit(0L)))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup_windows", "dup_tokens"))
      .withColumn("dup_pm", expr("dup_tokens * 1000 div greatest(n_tokens, 1)"))
      .orderBy(col("doc_id"))
  }

  val SubPairCap = 16 // df-cap on window-hash groups for pair mining

  /** D13 `dedup_substring_pairs` — the audit companion to D12: WHICH
    * doc pairs share long exact spans (D12 scores coverage per doc;
    * the curation decision "these two are copies of each other" wants
    * the pair). Shared-window counts per unordered doc pair, mined
    * from the same corpus-wide window-hash groups: one row per
    * (hash, doc) first (intra-doc repeats collapse so a pair is
    * counted once per DISTINCT shared window), then pairs generate
    * ONLY inside hash groups touching ≥2 and ≤ [[SubPairCap]] docs —
    * D2's df-cap discipline again: a window shared by everyone is
    * boilerplate carrying no pairwise-copy signal, and the cap is
    * what bounds the O(Σ g²) fan-out at 100 TB. Top-20 by
    * (shared-window count, pair) — TakeOrderedAndProject, no global
    * materialization. The heaviest pairs feed D6's cluster step.
    */
  def dedupSubstringPairs(spark: SparkSession, dir: String): DataFrame =
    substringPairs(Tables(spark, dir, "documents"))

  /** [[dedupSubstringPairs]]'s kernel on any (doc_id, text) frame. */
  def substringPairs(docs: DataFrame): DataFrame =
    substringPairFrame(docs)
      .orderBy(col("n_shared_windows").desc, col("da"), col("db"))
      .limit(20)

  /** The full (da, db, n_shared_windows) pair frame behind D13/D14. */
  private[dedup] def substringPairFrame(docs: DataFrame): DataFrame = {
    val occ = docs
      .select(col("doc_id"),
        explode(rollingWinHashes(col("text"), SubTokens)).as("wh"))
      .groupBy(col("wh"), col("doc_id")).agg(count(lit(1)).as("n_occ"))
    val grp = occ
      .withColumn("g", count(lit(1)).over(Window.partitionBy(col("wh"))))
      .filter(col("g") >= 2 && col("g") <= SubPairCap)
      .select(col("wh"), col("doc_id"))
    grp.as("a").join(grp.as("b"),
        col("a.wh") === col("b.wh") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("n_shared_windows"))
  }

  val SubClusterMinShared = 4 // edge threshold: ≥ a 19-token shared run

  /** D14 `dedup_substring_clusters` — copy GROUPS from exact-substring
    * evidence: D13's pair frame thresholded at
    * [[SubClusterMinShared]] shared windows (≥ 4 sliding 16-token
    * windows ⟺ a shared run of ≥ 19 tokens — long enough to mean
    * copying, not idiom) becomes an edge list, resolved by the SAME
    * [[connectedComponents]] hybrid kernel D6 uses (reused, not
    * re-implemented), so transitive copies group even when the
    * endpoints share nothing directly (A copies B, B copies C ⇒ one
    * cluster). Output one row per clustered doc with its canonical
    * min-id label and cluster size — the drop-decision frame a
    * curation pipeline acts on, completing the substring family:
    * D12 scores coverage, D13 names pairs, D14 hands over the groups.
    * Scale shape: everything up to the edge list is D13's bucketed
    * plan; the CC kernel sees only the O(pairs) thresholded edges
    * (231 at sf0.1), never documents.
    */
  def dedupSubstringClusters(spark: SparkSession, dir: String): DataFrame =
    substringClusters(Tables(spark, dir, "documents"))

  /** [[dedupSubstringClusters]]'s kernel on any (doc_id, text) frame. */
  def substringClusters(docs: DataFrame): DataFrame = {
    val edges = substringPairFrame(docs)
      .filter(col("n_shared_windows") >= SubClusterMinShared)
      .select(col("da").as("u"), col("db").as("v"))
    val wc = Window.partitionBy(col("cluster_id"))
    connectedComponents(edges)
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(wc))
      .orderBy(col("doc_id"))
  }

  val IncMod = 5 // deterministic intake slice: doc_id % IncMod == 0

  /** D15 `dedup_incremental` — INTAKE-vs-STORE dedup, the daily-crawl
    * shape every production corpus actually runs (D1–D14 dedup a
    * corpus against itself; a live pipeline dedups today's batch
    * against yesterday's 100 TB store, and must NEVER re-dedup the
    * store): the store reduces to two persisted sidecars — its
    * DISTINCT window-hash set (the D12 substring evidence) and its
    * DISTINCT content-fingerprint set (the D1 exact evidence) — and
    * each intake doc is scored against them. Here the store/intake
    * split is the deterministic `doc_id % [[IncMod]]` slice (the
    * house stand-in for a date boundary; production swaps one filter
    * for a snapshot read, A3's discipline).
    *
    * Per intake doc: window hits against the store (LEFT SEMI on the
    * 8-byte hash — the store side never fans out, no doc pair exists
    * anywhere), duplicated-token coverage as the interval union of
    * hit windows (D12's prev-end running max), and the exact-copy
    * flag via fingerprint semi-join. Scale shape: the two store
    * sidecars are O(store tokens) / O(store docs) hash sets that at
    * 100 TB are built ONCE and appended per batch (E30's append
    * discipline applied to dedup state); the per-batch cost is one
    * intake-sized scan + two hash-keyed semi-joins — the store is
    * scanned zero times per batch once the sidecars exist. The
    * streaming twin is G15's keep-first gate; this is the batch
    * replay that backfills it. Oracle: literal window strings +
    * the C4 fingerprint spelling (D12's collision-certification
    * argument carries over verbatim).
    */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame =
    incrementalDedup(Tables(spark, dir, "documents"))

  /** [[dedupIncremental]]'s kernel on any (doc_id, text) frame. */
  def incrementalDedup(docs: DataFrame): DataFrame = {
    val w = SubTokens
    val store = docs.filter(col("doc_id") % IncMod =!= 0)
    val intake = docs.filter(col("doc_id") % IncMod === 0)
    val storeWins = store
      .select(explode(rollingWinHashes(col("text"), w)).as("wh"))
      .distinct()
    val storeFps = store
      .select(TextOps.fingerprint(col("text")).as("fp"))
      .distinct()
    val wins = intake.select(col("doc_id"),
      posexplode(rollingWinHashes(col("text"), w)).as(Seq("pos", "wh")))
    val hits = wins.join(storeWins, Seq("wh"), "left_semi")
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val perDoc = hits
      .withColumn("prev_end", max(col("pos") + w).over(wDoc))
      .withColumn("cov",
        col("pos") + w -
          greatest(col("pos"), coalesce(col("prev_end"), col("pos"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit_windows"),
        sum(col("cov")).as("dup_tokens"))
    val exact = intake
      .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
      .join(storeFps, Seq("fp"), "left_semi")
      .select(col("doc_id"), lit(1).as("exact_dup"))
    intake
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("n_windows",
        greatest(col("n_tokens") - (w - 1), lit(0L)))
      .join(perDoc, Seq("doc_id"), "left")
      .join(exact, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_hit_windows", "dup_tokens"))
      .na.fill(0, Seq("exact_dup"))
      .withColumn("dup_pm", expr("dup_tokens * 1000 div greatest(n_tokens, 1)"))
      .orderBy(col("doc_id"))
  }

  /** Near-dup bar for the incremental MinHash tier: candidate store
    * docs whose signatures agree on at least this many of the
    * [[NumPerms]] permutations count as near-dups — the estimated
    * Jaccard ≥ 0.5, D3's verify bar expressed in signature space.
    */
  val IncMinhashMinMatches: Int = NumPerms / 2

  /** D19 `dedup_incremental_minhash` — the NEAR-DUP tier of D15's
    * intake-vs-store dedup (r12 verdict task 6): D15's sidecars catch
    * exact copies and verbatim substrings, but a paraphrased
    * near-copy of a store doc sails through both. This operator
    * persists D3's banded-LSH state as TWO store sidecars — the
    * (band, bucket, store-doc) band table and the (store-doc,
    * signature) table — and scores each intake batch against them:
    * band-bucket equi-join for candidates, then the match count
    * between the two 128-perm signatures as the ESTIMATED Jaccard
    * (matches/perms is an unbiased estimator; 128 perms put the
    * standard error at ~0.044, the standard sig-store trade — the
    * store TEXT is never read, which is the point). Split is D15's
    * `doc_id % [[IncMod]]` stand-in.
    *
    * Scale shape: the sidecars are O(store docs × bands) and O(store
    * docs × perms) — built once, appended per batch (E30's append
    * discipline); per batch the store is scanned ZERO times: one
    * intake-sized signature pass, a band equi-join against the band
    * sidecar, and a sid-keyed join of the RARE candidates against
    * the signature sidecar. Everything is integer (match counts,
    * floor-division basis points) → bit-exact oracle replay.
    * Empty-shingle docs are excluded on both sides: their signature
    * is the all-max sentinel, which would make every pair of them a
    * spurious full match.
    */
  def dedupIncrementalMinhash(spark: SparkSession,
      dir: String): DataFrame =
    dedupIncrementalMinhashOf(Tables(spark, dir, "documents"))

  /** [[dedupIncrementalMinhash]]'s kernel on any (doc_id, text)
    * frame.
    */
  def dedupIncrementalMinhashOf(docs: DataFrame): DataFrame =
    incrementalMinhash(shingledOf(docs))

  /** [[dedupIncrementalMinhash]]'s kernel on any (doc_id, shingles)
    * frame (see [[shingledOf]]; store/intake split by doc_id %
    * [[IncMod]]).
    */
  def incrementalMinhash(shingledDocs: DataFrame): DataFrame = {
    val sig = shingledDocs
      .filter(size(col("shingles")) >= 1)
      .select(col("doc_id"), minhashSig(col("shingles"), NumPerms).as("sig"))
      .localCheckpoint(true, MEMORY_AND_DISK_SER) // both sidecars + the intake pass read it
    val (bandSc, sigSc) = minhashSidecars(
      sig.filter(col("doc_id") % IncMod =!= 0))
    intakeMinhashDedup(
      sig.filter(col("doc_id") % IncMod === 0), bandSc, sigSc)
  }

  /** The two persisted store sidecars for the near-dup tier, from a
    * (doc_id, sig) store frame: the band table (band, bucket, sid)
    * and the signature table (sid, ssig). A deployment writes these
    * once and appends per batch; the spec drives them standalone to
    * pin "store never rescanned".
    */
  def minhashSidecars(
      storeSig: DataFrame): (DataFrame, DataFrame) = {
    val rows = NumPerms / NumBands
    val bands = storeSig.select(col("doc_id").as("sid"),
      posexplode(expr(
        s"transform(sequence(0, $NumBands - 1), " +
          s"b -> slice(sig, b * $rows + 1, $rows))"))
        .as(Seq("band", "bucket")))
    (bands, storeSig.select(col("doc_id").as("sid"), col("sig").as("ssig")))
  }

  /** Score one intake batch (doc_id, sig) against the store sidecars —
    * the per-batch arm; see [[dedupIncrementalMinhash]]. One row per
    * intake doc: distinct banded candidates, near-dups at the
    * [[IncMinhashMinMatches]] bar, and the best match in perms and
    * floor-div basis points.
    */
  def intakeMinhashDedup(intakeSig: DataFrame,
      bandSidecar: DataFrame, sigSidecar: DataFrame): DataFrame = {
    val rows = NumPerms / NumBands
    val iband = intakeSig.select(col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, $NumBands - 1), " +
          s"b -> slice(sig, b * $rows + 1, $rows))"))
        .as(Seq("band", "bucket")))
    val cand = iband.join(bandSidecar.select(col("band"), col("bucket"),
        col("sid")), Seq("band", "bucket"))
      .select(col("doc_id"), col("sid")).distinct()
    val scored = cand
      .join(intakeSig, Seq("doc_id"))
      .join(sigSidecar, Seq("sid"))
      .withColumn("matches", expr(
        "size(filter(zip_with(sig, ssig, (x, y) -> x = y), b -> b))")
        .cast("long"))
    val agg = scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("matches") >= IncMinhashMinMatches, 1L)
          .otherwise(0L)).as("n_near_dups"),
        max(col("matches")).as("best_match_perms"))
    intakeSig.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_candidates", "n_near_dups", "best_match_perms"))
      .withColumn("best_match_bp",
        expr(s"best_match_perms * 10000 div $NumPerms"))
      .orderBy(col("doc_id"))
  }

  /** D16 `dedup_hot_spans` — WHAT text is duplicated: the top-20 most
    * repeated 16-token windows corpus-wide, with occurrence and
    * distinct-doc counts (D12 scores docs, D13/D14 name pairs and
    * groups; the curation question left is "what IS this boilerplate"
    * — the report that decides between a regex strip rule and a
    * crawler fix). Groups form on the 8-byte rolling hash (never the
    * string — the corpus-sized exchange carries ~24-byte rows);
    * the literal window text materializes ONLY for dup groups, by
    * joining each group's canonical (min (doc, pos)) occurrence back
    * to its document and slicing the token range — O(dup groups)
    * rows against one corpus-side join, never a corpus-wide string
    * fan-out. Top-20 by (occurrences, window text) rides
    * TakeOrderedAndProject. The oracle groups on the literal window
    * string, so the green gate again certifies hash ≡ string
    * grouping (D12's argument).
    */
  def dedupHotSpans(spark: SparkSession, dir: String): DataFrame =
    hotSpans(Tables(spark, dir, "documents"))

  /** [[dedupHotSpans]]'s kernel on any (doc_id, text) frame. */
  def hotSpans(docs: DataFrame): DataFrame = {
    val w = SubTokens
    val wins = docs.select(col("doc_id"),
      posexplode(rollingWinHashes(col("text"), w)).as(Seq("pos", "wh")))
    val grps = wins.groupBy(col("wh"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(struct(col("doc_id"), col("pos"))).as("canon"))
      .filter(col("n_occurrences") >= 2)
    grps
      .select(col("n_occurrences"), col("n_docs"),
        col("canon.doc_id").as("doc_id"), col("canon.pos").as("pos"))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .withColumn("win", array_join(
        slice(TextOps.tokens(col("text")), col("pos") + 1, lit(w)), " "))
      .select(col("win"), col("n_occurrences"), col("n_docs"))
      .orderBy(col("n_occurrences").desc, col("win"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_incremental_minhash" -> (dedupIncrementalMinhash _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_hot_spans" -> (dedupHotSpans _),
    "dedup_substring_clusters" -> (dedupSubstringClusters _),
    "dedup_substring_pairs" -> (dedupSubstringPairs _),
    "dedup_substring" -> (dedupSubstring _),
    "dedup_segments" -> (dedupSegments _),
    "dedup_exact" -> (dedupExact _),
    "dedup_by_source" -> (dedupBySource _),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "decontaminate_fuzzy" -> (decontaminateFuzzy _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_embedding" -> (dedupEmbedding _),
    "dedup_clusters" -> (dedupClusters _)
    // dedup_embedding_lsh is a library API (the scale path for D5) but
    // not a driver query: this testdata has no cosine-0.9 near-dups, so
    // its correct output here is empty — it's exercised by DedupSpec on
    // planted duplicates instead.
  )

  // The minhash/simhash oracles replay graft's hash64 kernel exactly in
  // SQL: seed-initialized polynomial fold (list_reduce over hex-decoded
  // UTF-8 bytes) + the splitmix64 finalizer, all in HUGEINT modular
  // arithmetic. 64×64-bit wrapping multiplies split into 32-bit halves
  // so no intermediate exceeds INT128. Constants: seeds 0x9747b28c /
  // 0x85ebca6b, splitmix K1 0x9e3779b97f4a7c15, K2 0xbf58476d1ce4e5b9
  // (hi 3210233709 / lo 484763065), K3 0x94d049bb133111eb (hi
  // 2496678331 / lo 321982955).
  /** The exact 128-perm minhash-signature replay (shingles → byte
    * fold → splitmix finalizer → (a, b) permutation family → per-perm
    * min-hash → `sig`, with `s` carrying per-doc shingle sets) as a
    * shared oracle prefix for D3 and the D17 banding sweep.
    */
  private[graft] val minhashSigOracleCte: String =
    // sig carries a MATERIALIZED hint (round 12, the §8m(d)
    // betweenness discipline): the D17 sweep reads it once per band
    // config — inlined, DuckDB re-ran the whole 128-perm HUGEINT
    // chain per reference, which at sf1 pushed the sweep past the
    // gate's 600 s watchdog. `s` stays UN-hinted deliberately:
    // DuckDB 1.0.0 raises "Recursive CTE scan found without
    // recursive CTE node" (an internal assertion) when `s` is
    // materialized in the sweep, whose `truth` derived table nests
    // D2's oracle with its own shadowing `s` CTE.
    """t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |    FROM documents),
        |s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |    THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |      for i in range(1, len(w) - 1)]
        |    ELSE [] END) AS sh FROM t),
        |g0 AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |hb AS (SELECT doc_id, g, hex(encode(g)) AS hx,
        |    octet_length(encode(g)) AS n FROM g0),
        |bl AS (SELECT doc_id, g,
        |    [CAST(16*(strpos('0123456789ABCDEF', substr(hx,2*i-1,1))-1)
        |      + strpos('0123456789ABCDEF', substr(hx,2*i,1))-1 AS HUGEINT)
        |     for i in range(1, n+1)] AS bs
        |  FROM hb),
        |fa0 AS (SELECT doc_id, g,
        |    list_reduce(list_prepend(CAST('2538058380' AS HUGEINT), bs),
        |      (acc,x) -> (acc*1000003+x)
        |        % CAST('18446744073709551616' AS HUGEINT)) AS za,
        |    list_reduce(list_prepend(CAST('2246822507' AS HUGEINT), bs),
        |      (acc,x) -> (acc*1000003+x)
        |        % CAST('18446744073709551616' AS HUGEINT)) AS zb
        |  FROM bl),
        |fa1 AS (SELECT doc_id, g,
        |    (za + CAST('11400714819323198485' AS HUGEINT))
        |      % CAST('18446744073709551616' AS HUGEINT) AS za,
        |    (zb + CAST('11400714819323198485' AS HUGEINT))
        |      % CAST('18446744073709551616' AS HUGEINT) AS zb FROM fa0),
        |fa2 AS (SELECT doc_id, g,
        |    ((xor(za, za // 1073741824)*484763065)
        |      % CAST('18446744073709551616' AS HUGEINT)
        |    + ((xor(za, za // 1073741824)*3210233709) % 4294967296)
        |      * 4294967296)
        |      % CAST('18446744073709551616' AS HUGEINT) AS za,
        |    ((xor(zb, zb // 1073741824)*484763065)
        |      % CAST('18446744073709551616' AS HUGEINT)
        |    + ((xor(zb, zb // 1073741824)*3210233709) % 4294967296)
        |      * 4294967296)
        |      % CAST('18446744073709551616' AS HUGEINT) AS zb FROM fa1),
        |fa3 AS (SELECT doc_id, g,
        |    ((xor(za, za // 134217728)*321982955)
        |      % CAST('18446744073709551616' AS HUGEINT)
        |    + ((xor(za, za // 134217728)*2496678331) % 4294967296)
        |      * 4294967296)
        |      % CAST('18446744073709551616' AS HUGEINT) AS za,
        |    ((xor(zb, zb // 134217728)*321982955)
        |      % CAST('18446744073709551616' AS HUGEINT)
        |    + ((xor(zb, zb // 134217728)*2496678331) % 4294967296)
        |      * 4294967296)
        |      % CAST('18446744073709551616' AS HUGEINT) AS zb FROM fa2),
        |ab AS (SELECT doc_id, g,
        |    xor(za, za // 2147483648) AS a,
        |    CASE WHEN xor(zb, zb // 2147483648) % 2 = 0
        |      THEN xor(zb, zb // 2147483648) + 1
        |      ELSE xor(zb, zb // 2147483648) END AS b
        |  FROM fa3),
        |perm AS (SELECT doc_id, a, b, unnest(range(0, 128)) AS i FROM ab),
        |hv AS (SELECT doc_id, i, (a + CAST(i AS HUGEINT) * b)
        |    % CAST('18446744073709551616' AS HUGEINT) AS h FROM perm),
        |sigv AS (SELECT doc_id, i, min(h) AS mh FROM hv GROUP BY 1, 2),
        |sig AS MATERIALIZED (SELECT doc_id, array_agg(mh ORDER BY i) AS sig
        |  FROM sigv GROUP BY doc_id)""".stripMargin

  /** The banded-bucket oracle CTE (expects a `sig` CTE in scope):
    * band geometry DERIVED from [[NumPerms]]/[[NumBands]] exactly as
    * the Spark side derives it, so changing either constant moves
    * both sides together instead of tripping the gate with a
    * hardcoded `range(0, 32)`/`band*4` mismatch (r14 ADVICE).
    */
  private[graft] val bandKeyOracleCte: String = {
    val rows = NumPerms / NumBands
    s"""bk AS (SELECT doc_id, band,
       |    list_slice(sig, band*$rows+1, band*$rows+$rows) AS bucket
       |  FROM (SELECT doc_id, sig, unnest(range(0, $NumBands)) AS band
       |    FROM sig))""".stripMargin
  }

  /** Rounds for the shared propagate+jump CC oracle chain: label
    * coverage doubles per round, so 16 rounds resolve any component
    * of diameter ≤ 2^16 — far past what any tested corpus holds.
    */
  val CcOracleRounds = 16

  /** One unrolled CC round for a DuckDB oracle (shared shape, ported
    * from the r12/r13 mm_phash_clusters fix): PROPAGATE (min over
    * self + neighbor labels — one edge join, one group) then JUMP
    * (lbl ← lbl-of-lbl — one self equi join). Frames stay O(nodes)
    * per round, never the O(component²) a transitive-closure `reach`
    * recursion materializes — the blowup that wedged the sf1 gate on
    * a 28k-node cluster. `edges` names a CTE with symmetric (eu, ev)
    * columns; `pfx` namespaces the chain so several chains can live
    * under one WITH.
    */
  private[graft] def ccJumpRoundOracle(k: Int, edges: String,
      pfx: String): String =
    s"""${pfx}pp$k AS MATERIALIZED (SELECT l.node,
       |    least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
       |  FROM ${pfx}lab${k - 1} l
       |  LEFT JOIN $edges e ON e.eu = l.node
       |  LEFT JOIN ${pfx}lab${k - 1} n ON n.node = e.ev
       |  GROUP BY l.node, l.lbl),
       |${pfx}lab$k AS MATERIALIZED (SELECT a.node,
       |    coalesce(b.lbl, a.lbl) AS lbl
       |  FROM ${pfx}pp$k a LEFT JOIN ${pfx}pp$k b ON b.node = a.lbl)"""
      .stripMargin

  /** The full unrolled CC chain: lab0 seeding + `rounds` jump rounds.
    * Read the final labels from `${pfx}lab$rounds`; pair with
    * [[ccSentinelOracle]] so an under-unrolled chain self-identifies.
    */
  private[graft] def ccChainOracle(rounds: Int, edges: String,
      pfx: String): String =
    s"""${pfx}lab0 AS MATERIALIZED (SELECT eu AS node, eu AS lbl
       |  FROM (SELECT DISTINCT eu FROM $edges)),
       |${(1 to rounds).map(k => ccJumpRoundOracle(k, edges, pfx))
          .mkString(",\n")}""".stripMargin

  /** Convergence sentinel predicate (r13): true iff the last round
    * still moved a label — the consuming oracle emits an impossible
    * row under it, so non-convergence reads as "oracle needs more
    * rounds", not as a mystery label diff.
    */
  private[graft] def ccSentinelOracle(rounds: Int, pfx: String): String =
    s"""EXISTS (SELECT 1 FROM ${pfx}lab$rounds a
       |  JOIN ${pfx}lab${rounds - 1} b ON b.node = a.node
       |  WHERE a.lbl <> b.lbl)""".stripMargin

  val oracle: Map[String, String] = Map(
    // dedup_incremental_minhash: D3's signature replay, bipartite
    // band join (intake probes the store side), per-candidate match
    // count over the two signatures — all integers, so the estimated-
    // Jaccard tier replays bit-exactly
    "dedup_incremental_minhash" ->
      s"""WITH $minhashSigOracleCte,
        |$bandKeyOracleCte,
        |cand AS (SELECT DISTINCT i.doc_id AS doc_id, st.doc_id AS sid
        |  FROM bk i JOIN bk st ON i.band = st.band AND i.bucket = st.bucket
        |  WHERE i.doc_id % $IncMod = 0 AND st.doc_id % $IncMod <> 0),
        |m AS (SELECT c.doc_id, c.sid,
        |    len([i for i in range(1, ${NumPerms + 1})
        |      if sa.sig[i] = sb.sig[i]]) AS matches
        |  FROM cand c JOIN sig sa ON sa.doc_id = c.doc_id
        |    JOIN sig sb ON sb.doc_id = c.sid),
        |agg AS (SELECT doc_id, count(*) AS n_candidates,
        |    sum(CASE WHEN matches >= $IncMinhashMinMatches
        |      THEN 1 ELSE 0 END) AS n_near_dups,
        |    max(matches) AS best_match_perms
        |  FROM m GROUP BY doc_id)
        |SELECT s.doc_id,
        |  CAST(coalesce(a.n_candidates, 0) AS BIGINT) AS n_candidates,
        |  CAST(coalesce(a.n_near_dups, 0) AS BIGINT) AS n_near_dups,
        |  CAST(coalesce(a.best_match_perms, 0) AS BIGINT)
        |    AS best_match_perms,
        |  CAST(coalesce(a.best_match_perms, 0) * 10000 // $NumPerms
        |    AS BIGINT) AS best_match_bp
        |FROM s LEFT JOIN agg a ON a.doc_id = s.doc_id
        |WHERE s.doc_id % $IncMod = 0 AND len(s.sh) >= 1
        |ORDER BY s.doc_id""".stripMargin,
    // dedup_incremental: store sidecars as DISTINCT literal-window /
    // fingerprint sets, intake scored by semi-join — same literal-
    // string grouping as D12, so the gate certifies the hash sidecar
    "dedup_incremental" ->
      s"""WITH t AS (SELECT doc_id,
         |    string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |sw0 AS (SELECT w, unnest(range(1, len(w) - 14)) AS i
         |  FROM t WHERE doc_id % $IncMod <> 0 AND len(w) >= 16),
         |swins AS (SELECT DISTINCT array_to_string(w[i : i + 15], ' ')
         |    AS win FROM sw0),
         |iw0 AS (SELECT doc_id, w, unnest(range(1, len(w) - 14)) AS i
         |  FROM t WHERE doc_id % $IncMod = 0 AND len(w) >= 16),
         |iwins AS (SELECT doc_id, i - 1 AS pos,
         |    array_to_string(w[i : i + 15], ' ') AS win
         |  FROM iw0),
         |h AS (SELECT doc_id, pos FROM iwins JOIN swins USING (win)),
         |iv AS (SELECT doc_id, pos,
         |    max(pos + 16) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS prev_end
         |  FROM h),
         |agg AS (SELECT doc_id,
         |    count(*) AS n_hit_windows,
         |    sum(pos + 16 - greatest(pos, coalesce(prev_end, pos)))
         |      AS dup_tokens
         |  FROM iv GROUP BY doc_id),
         |sfp AS (SELECT DISTINCT
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents WHERE doc_id % $IncMod <> 0),
         |ifp AS (SELECT doc_id,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents WHERE doc_id % $IncMod = 0),
         |ex AS (SELECT doc_id FROM ifp JOIN sfp USING (fp)),
         |base AS (SELECT doc_id, len(w) AS n_tokens,
         |    greatest(len(w) - 15, 0) AS n_windows
         |  FROM t WHERE doc_id % $IncMod = 0)
         |SELECT b.doc_id, b.n_tokens, b.n_windows,
         |  coalesce(a.n_hit_windows, 0) AS n_hit_windows,
         |  CAST(coalesce(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
         |  CAST(coalesce(a.dup_tokens, 0) * 1000 // greatest(b.n_tokens, 1) AS BIGINT)
         |    AS dup_pm,
         |  CAST(e.doc_id IS NOT NULL AS INT) AS exact_dup
         |FROM base b LEFT JOIN agg a USING (doc_id)
         |  LEFT JOIN ex e USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin,
    // dedup_hot_spans: literal-window grouping (collision
    // certification, D12's argument), top-20 by (count, window)
    "dedup_hot_spans" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |w0 AS (SELECT doc_id, w,
        |    unnest(range(1, len(w) - 14)) AS i
        |  FROM t WHERE len(w) >= 16),
        |wins AS (SELECT doc_id,
        |    array_to_string(w[i : i + 15], ' ') AS win
        |  FROM w0),
        |g AS (SELECT win, count(*) AS n_occurrences,
        |    count(DISTINCT doc_id) AS n_docs
        |  FROM wins GROUP BY win HAVING count(*) >= 2)
        |SELECT win, n_occurrences, n_docs FROM g
        |ORDER BY n_occurrences DESC, win LIMIT 20""".stripMargin,
    // dedup_substring: the oracle keys window groups on the LITERAL
    // 16-token window string (not a hash replay) — a Spark-side hash
    // collision would therefore flip counts and FAIL the gate, so a
    // green row certifies hash-grouping ≡ string-grouping on this
    // corpus; interval union via the same prev-end running max
    "dedup_substring" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |w0 AS (SELECT doc_id, w,
        |    unnest(range(1, len(w) - 14)) AS i
        |  FROM t WHERE len(w) >= 16),
        |wins AS (SELECT doc_id, i - 1 AS pos,
        |    array_to_string(w[i : i + 15], ' ') AS win
        |  FROM w0),
        |d AS (SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos, count(*) OVER (PARTITION BY win) AS c
        |    FROM wins) WHERE c >= 2),
        |iv AS (SELECT doc_id, pos,
        |    max(pos + 16) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_end
        |  FROM d),
        |agg AS (SELECT doc_id,
        |    count(*) AS n_dup_windows,
        |    sum(pos + 16 - greatest(pos, coalesce(prev_end, pos)))
        |      AS dup_tokens
        |  FROM iv GROUP BY doc_id),
        |base AS (SELECT doc_id, len(w) AS n_tokens,
        |    greatest(len(w) - 15, 0) AS n_windows
        |  FROM t)
        |SELECT b.doc_id, b.n_tokens, b.n_windows,
        |  coalesce(a.n_dup_windows, 0) AS n_dup_windows,
        |  CAST(coalesce(a.dup_tokens, 0) AS BIGINT) AS dup_tokens,
        |  CAST(coalesce(a.dup_tokens, 0) * 1000 // greatest(b.n_tokens, 1) AS BIGINT)
        |    AS dup_pm
        |FROM base b LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // dedup_substring_clusters: D13's pair chain thresholded into an
    // edge list, resolved by the D6 recursive reach (bounded: the
    // substring-pair graph is O(hundreds) of edges at any test SF)
    "dedup_substring_clusters" ->
      s"""WITH RECURSIVE
         |t AS (SELECT doc_id,
         |    string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |w0 AS (SELECT doc_id, w,
         |    unnest(range(1, len(w) - 14)) AS i
         |  FROM t WHERE len(w) >= 16),
         |wins AS (SELECT doc_id,
         |    array_to_string(w[i : i + 15], ' ') AS win
         |  FROM w0),
         |occ AS (SELECT win, doc_id FROM wins GROUP BY win, doc_id),
         |grp AS (SELECT win, doc_id FROM (
         |    SELECT win, doc_id, count(*) OVER (PARTITION BY win) AS g
         |    FROM occ)
         |  WHERE g >= 2 AND g <= $SubPairCap),
         |p AS (SELECT a.doc_id AS da, b.doc_id AS db,
         |    count(*) AS n_shared
         |  FROM grp a JOIN grp b
         |    ON a.win = b.win AND a.doc_id < b.doc_id
         |  GROUP BY da, db),
         |pairs AS (SELECT da, db FROM p
         |  WHERE n_shared >= $SubClusterMinShared),
         |edges AS (SELECT da AS u, db AS v FROM pairs
         |  UNION SELECT db, da FROM pairs),
         |reach(u, r) AS (
         |  SELECT u, u FROM (SELECT DISTINCT u FROM edges)
         |  UNION
         |  SELECT e2.u, reach.r FROM edges e2 JOIN reach ON reach.u = e2.v),
         |res AS (SELECT u AS doc_id, min(r) AS cluster_id
         |  FROM reach GROUP BY u)
         |SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM res ORDER BY doc_id""".stripMargin,
    // dedup_substring_pairs: same literal-window-string grouping as
    // D12 (collision-freeness certified by the gate), distinct
    // (window, doc) rows, df-capped groups, pair counts, top-20
    "dedup_substring_pairs" ->
      s"""WITH t AS (SELECT doc_id,
         |    string_split_regex(trim(text), '\\s+') AS w
         |  FROM documents),
         |w0 AS (SELECT doc_id, w,
         |    unnest(range(1, len(w) - 14)) AS i
         |  FROM t WHERE len(w) >= 16),
         |wins AS (SELECT doc_id,
         |    array_to_string(w[i : i + 15], ' ') AS win
         |  FROM w0),
         |occ AS (SELECT win, doc_id FROM wins GROUP BY win, doc_id),
         |grp AS (SELECT win, doc_id FROM (
         |    SELECT win, doc_id, count(*) OVER (PARTITION BY win) AS g
         |    FROM occ)
         |  WHERE g >= 2 AND g <= $SubPairCap),
         |p AS (SELECT a.doc_id AS da, b.doc_id AS db,
         |    count(*) AS n_shared_windows
         |  FROM grp a JOIN grp b
         |    ON a.win = b.win AND a.doc_id < b.doc_id
         |  GROUP BY da, db)
         |SELECT da, db, n_shared_windows FROM p
         |ORDER BY n_shared_windows DESC, da, db LIMIT 20""".stripMargin,
    // dedup_segments: Spark's min(struct(doc_id, seg_id)) ≡ the rn=1
    // slot of a (doc_id, seg_id)-ordered window per segment hash
    "dedup_segments" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |s0 AS (SELECT doc_id, w,
        |    unnest(range(0, CAST(ceil(len(w) / 16.0) AS BIGINT)))
        |      AS seg_id
        |  FROM t),
        |seg AS (SELECT doc_id, seg_id,
        |    md5(array_to_string(w[seg_id*16+1 : seg_id*16+16], ' '))
        |      AS seg_fp
        |  FROM s0),
        |rk AS (SELECT doc_id, seg_id, row_number() OVER (
        |    PARTITION BY seg_fp ORDER BY doc_id, seg_id) AS rn
        |  FROM seg)
        |SELECT doc_id, count(*) AS n_segments,
        |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_segments,
        |  round((count(*) - sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END))
        |    * 1.0 / count(*), 4) AS kept_frac
        |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "dedup_simhash" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
        |    FROM documents),
        |tok AS (SELECT doc_id, unnest(w) AS tk FROM t),
        |hb AS (SELECT doc_id, tk, hex(encode(tk)) AS hx,
        |    octet_length(encode(tk)) AS n FROM tok),
        |bl AS (SELECT doc_id,
        |    [CAST(16*(strpos('0123456789ABCDEF', substr(hx,2*i-1,1))-1)
        |      + strpos('0123456789ABCDEF', substr(hx,2*i,1))-1 AS HUGEINT)
        |     for i in range(1, n+1)] AS bs
        |  FROM hb),
        |f0 AS (SELECT doc_id,
        |    list_reduce(list_prepend(CAST('2538058380' AS HUGEINT), bs),
        |      (acc,x) -> (acc*1000003+x)
        |        % CAST('18446744073709551616' AS HUGEINT)) AS z FROM bl),
        |m1 AS (SELECT doc_id, (z + CAST('11400714819323198485' AS HUGEINT))
        |    % CAST('18446744073709551616' AS HUGEINT) AS z FROM f0),
        |m2 AS (SELECT doc_id, ((xor(z, z // 1073741824)*484763065)
        |      % CAST('18446744073709551616' AS HUGEINT)
        |    + ((xor(z, z // 1073741824)*3210233709) % 4294967296)
        |      * 4294967296)
        |    % CAST('18446744073709551616' AS HUGEINT) AS z FROM m1),
        |m3 AS (SELECT doc_id, ((xor(z, z // 134217728)*321982955)
        |      % CAST('18446744073709551616' AS HUGEINT)
        |    + ((xor(z, z // 134217728)*2496678331) % 4294967296)
        |      * 4294967296)
        |    % CAST('18446744073709551616' AS HUGEINT) AS z FROM m2),
        |hh AS (SELECT doc_id, xor(z, z // 2147483648) AS h FROM m3),
        |bits AS (SELECT doc_id, h, unnest(range(0, 64)) AS bit FROM hh),
        |votes AS (SELECT doc_id, bit,
        |    sum(CASE WHEN (h // (CAST(1 AS HUGEINT) << CAST(bit AS INT)))
        |      % 2 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM bits GROUP BY 1, 2),
        |sig AS (SELECT doc_id,
        |    coalesce(sum(CASE WHEN v > 0
        |      THEN CAST(1 AS HUGEINT) << CAST(bit AS INT) END),
        |      CAST(0 AS HUGEINT)) AS su
        |  FROM votes GROUP BY doc_id),
        |ch AS (SELECT doc_id, su, unnest(range(0,4)) AS chunk_idx FROM sig),
        |chunks AS (SELECT doc_id, su, chunk_idx,
        |    (su // (CAST(1 AS HUGEINT) << CAST(chunk_idx*16 AS INT)))
        |      % 65536 AS chunk FROM ch),
        |cand AS (SELECT DISTINCT a.doc_id ia, b.doc_id ib,
        |    a.su sua, b.su sub
        |  FROM chunks a JOIN chunks b ON a.chunk_idx = b.chunk_idx
        |    AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
        |SELECT ia, ib, bit_count(xor(sua, sub)) AS hamming
        |FROM cand WHERE bit_count(xor(sua, sub)) <= 3
        |ORDER BY ia, ib""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $minhashSigOracleCte,
        |$bandKeyOracleCte,
        |cand AS (SELECT DISTINCT a.doc_id ia, b.doc_id ib
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
        |    AND a.doc_id < b.doc_id),
        |j AS (SELECT ia, ib,
        |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
        |      (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
        |      AS jac
        |  FROM cand JOIN s sa ON sa.doc_id = ia JOIN s sb ON sb.doc_id = ib)
        |SELECT ia, ib, round(jac, 4) AS jaccard FROM j
        |WHERE round(jac, 6) >= $NearDupTau ORDER BY ia, ib""".stripMargin,
    // decontaminate_fuzzy: D3's signature replay, bipartite band join
    // (corpus probes the eval side), C41's one-row-per-bench-doc shape
    "decontaminate_fuzzy" ->
      s"""WITH $minhashSigOracleCte,
        |$bandKeyOracleCte,
        |cand AS (SELECT DISTINCT c.doc_id AS cdoc, b.doc_id AS bench_id
        |  FROM bk c JOIN bk b ON c.band = b.band AND c.bucket = b.bucket
        |  WHERE c.doc_id % ${graft.text.TextOps.ContamMod} <> 0
        |    AND b.doc_id % ${graft.text.TextOps.ContamMod} = 0),
        |j AS (SELECT bench_id, cdoc,
        |    CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE) /
        |      (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh)))
        |      AS jac
        |  FROM cand JOIN s sa ON sa.doc_id = cdoc
        |    JOIN s sb ON sb.doc_id = bench_id),
        |h AS (SELECT bench_id, count(*) AS n_contam_docs,
        |    max(round(jac, 4)) AS max_jaccard
        |  FROM j WHERE round(jac, 6) >= $FuzzyContamTau GROUP BY bench_id)
        |SELECT s.doc_id AS bench_id,
        |  coalesce(h.n_contam_docs, 0) AS n_contam_docs,
        |  coalesce(h.max_jaccard, 0.0) AS max_jaccard
        |FROM s LEFT JOIN h ON h.bench_id = s.doc_id
        |WHERE s.doc_id % ${graft.text.TextOps.ContamMod} = 0
        |ORDER BY bench_id""".stripMargin,
    // dedup_clusters: pair mining as before, but components resolved
    // by the shared propagate+jump chain (r14 — the mm_phash port):
    // the old transitive-closure `reach` recursion materializes
    // O(component²) rows, one big component away from wedging the
    // 900 s gate. Sentinel row (-1,-1,-1) iff under-unrolled.
    "dedup_clusters" ->
      s"""WITH
        |t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
        |    FROM documents),
        |s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |    THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |      for i in range(1, len(w) - 1)] ELSE [] END) sh FROM t),
        |e0 AS (SELECT doc_id, unnest(sh) g FROM s),
        |keep AS (SELECT g FROM e0 GROUP BY g HAVING count(*) <= $MaxShingleDf),
        |e AS (SELECT e0.* FROM e0 JOIN keep USING (g)),
        |sz AS (SELECT doc_id, count(*) n_sh FROM e GROUP BY doc_id),
        |p AS (SELECT a.doc_id ia, b.doc_id ib, count(*) n_common
        |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |fuzzy AS (SELECT ia, ib FROM p
        |  JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
        |  WHERE round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6)
        |    >= $NearDupTau),
        |f AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |ex AS (SELECT min(doc_id) OVER (PARTITION BY fp) AS ia, doc_id AS ib
        |  FROM f),
        |pairs AS (SELECT ia, ib FROM fuzzy
        |  UNION SELECT ia, ib FROM ex WHERE ia < ib),
        |edges AS MATERIALIZED (SELECT ia AS eu, ib AS ev FROM pairs
        |  UNION SELECT ib, ia FROM pairs),
        |${ccChainOracle(CcOracleRounds, "edges", "cc")},
        |res AS (SELECT node AS doc_id, lbl AS cluster_id
        |  FROM cclab$CcOracleRounds)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM res
        |UNION ALL
        |SELECT -1, -1, -1
        |WHERE ${ccSentinelOracle(CcOracleRounds, "cc")}
        |ORDER BY doc_id""".stripMargin,
    "dedup_by_source" ->
      """WITH f AS (SELECT doc_id, source,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |d AS (SELECT source,
        |    CASE WHEN doc_id <> min(doc_id) OVER (PARTITION BY fp)
        |      THEN 1 ELSE 0 END AS is_dup
        |  FROM f)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(is_dup) AS BIGINT) AS n_dups,
        |  CAST(sum(is_dup) AS BIGINT) * 10000 // count(*) AS dup_bp
        |FROM d GROUP BY source ORDER BY source""".stripMargin,
    "dedup_exact" ->
      """WITH f AS (SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents)
        |SELECT doc_id, fp,
        |  min(doc_id) OVER (PARTITION BY fp) AS keep_id,
        |  CAST(doc_id <> min(doc_id) OVER (PARTITION BY fp) AS INT) AS is_dup,
        |  count(*) OVER (PARTITION BY fp) AS group_size
        |FROM f ORDER BY doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') w
        |    FROM documents),
        |s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |    THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |      for i in range(1, len(w) - 1)] ELSE [] END) sh FROM t),
        |e0 AS (SELECT doc_id, unnest(sh) g FROM s),
        |keep AS (SELECT g FROM e0 GROUP BY g HAVING count(*) <= $MaxShingleDf),
        |e AS (SELECT e0.* FROM e0 JOIN keep USING (g)),
        |sz AS (SELECT doc_id, count(*) n_sh FROM e GROUP BY doc_id),
        |p AS (SELECT a.doc_id ia, b.doc_id ib, count(*) n_common
        |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT ia, ib,
        |  round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 4) AS jaccard
        |FROM p JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib
        |WHERE round(n_common * 1.0 / (sa.n_sh + sb.n_sh - n_common), 6) >= $NearDupTau
        |ORDER BY ia, ib""".stripMargin,
    "dedup_embedding" ->
      """SELECT a.vec_id ia, b.vec_id ib,
        |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |    CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
        |ORDER BY ia, ib""".stripMargin
    // dedup_minhash_lsh / dedup_simhash / dedup_embedding_lsh are
    // hash-based → rows-only driver check; their recall is spec-tested
    // against the exact operators.
  )
}
