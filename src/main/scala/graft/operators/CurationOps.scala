package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables
import graft.text.TextOps
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

/** Round-4 curation / pipeline additions (SURVEY.md §2 A31, B71, C26,
  * D8, E13): late-data audit, the bucketed scale path for keyless
  * interval joins, vocabulary coverage, directed containment dedup,
  * and embedding whitening.
  *
  * House rules apply: declarative plans, exact integer arithmetic
  * wherever a ratio could land on a round-half boundary (basis-point
  * floor division instead of float rounding), deterministic
  * tie-breaks, and a DuckDB oracle per operator.
  */
object CurationOps {

  val LateDelay = "INTERVAL 10 MINUTES" // watermark lateness bound

  /** A31 `etl_late_data` — late-arrival audit, the batch twin of a
    * streaming watermark: per user, the running max event time over
    * arrival order (event_id) is the watermark; an event whose ts
    * trails it by more than [[LateDelay]] would have been dropped by
    * a streaming window with that delay. The audit tells you what
    * delay bound the data actually needs before you pick one. One
    * window + one agg, both keyed on user_id — a single shuffle.
    * Lateness is reported in whole seconds via exact integer micros
    * (floor division; non-negative by construction).
    */
  def etlLateData(spark: SparkSession, dir: String): DataFrame =
    etlLateDataOf(Tables(spark, dir, "events"))


  /** [[etlLateData]]'s kernel on any events-shaped frame. */
  def etlLateDataOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("wm", max(col("ts")).over(w))
      .withColumn("late", col("ts") < col("wm") - expr(LateDelay))
      .withColumn("late_sec",
        when(col("late"),
          expr("(unix_micros(wm) - unix_micros(ts)) div 1000000"))
          .otherwise(lit(0L)))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
        max(col("late_sec")).as("max_late_sec"))
      .orderBy(col("user_id"))
  }

  val WindowDays = 7 // attribution window length (days, inclusive start)

  /** B71 `interval_join_bucketed` — keyless interval join via epoch
    * bucketing, the scale path a plain range predicate doesn't have:
    * with no equi key, Catalyst can only nested-loop an
    * interval-overlap join (O(n·m) at 100 TB). Bucketing makes one:
    * each interval EXPLODES into the (bounded, here ≤[[WindowDays]])
    * day buckets it covers, points bucket to their own day, and the
    * join becomes a plain hash equi-join on the bucket with the range
    * predicate re-checked at bucket grain. Second scale lever: the
    * measures here are ADDITIVE and the interval endpoints align to
    * the bucket grain, so points pre-aggregate to ONE row per bucket
    * BEFORE the join — the join output is O(intervals·days), never
    * O(matching point pairs) (52M rows at sf0.1 without it, 210 K
    * with; at 100 TB the difference is the job). Sub-bucket endpoints
    * or non-additive measures ⇒ skip the pre-agg and join raw points,
    * re-checking the exact predicate after — the bucketing still
    * carries the join. Workload: shipments attributed to urgent-order
    * processing windows ([o_orderdate, +6d]).
    */
  def intervalJoinBucketed(spark: SparkSession, dir: String): DataFrame =
    intervalJoinBucketedOf(Tables(spark, dir, "orders"), Tables(spark, dir, "lineitem"))

  /** [[intervalJoinBucketed]]'s kernel on caller orders/lineitem frames. */
  def intervalJoinBucketedOf(orders: DataFrame, li: DataFrame): DataFrame = {
    val win = orders
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("w_start"),
        date_add(to_date(col("o_orderdate")), WindowDays - 1).as("w_end"))
    val buckets = win.withColumn("day",
      explode(sequence(col("w_start"), col("w_end"))))
    val daily = li
      .groupBy(to_date(col("l_shipdate")).as("day"))
      .agg(count(lit(1)).as("n_day"), sum(col("l_quantity")).as("qty_day"))
    buckets.join(daily, Seq("day"))
      // bucket-grain predicate re-check: redundant here (the buckets
      // tile the window exactly) but REQUIRED the moment buckets are
      // coarser than the interval — kept so the pattern is correct by
      // construction, and Catalyst folds it cheaply
      .filter(col("day").between(col("w_start"), col("w_end")))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("n_day")).as("n_shipments"),
        round(sum(col("qty_day")), 2).as("sum_qty"))
      .orderBy(col("o_orderkey"))
  }

  val VocabK = 100 // reference vocabulary size

  /** C26 `vocab_coverage` — per-document out-of-vocabulary rate
    * against the corpus top-[[VocabK]] vocabulary: the cheap proxy
    * for "will my tokenizer shred this document" and a standard
    * corpus-quality gate. The vocabulary is O(K) → broadcast; the
    * corpus side is one explode + one left join + one per-doc agg.
    * OOV rate ships as exact basis points (floor division) — a float
    * ratio of small integers can land exactly on a round-half
    * boundary (1/32 = 0.03125) where the engines' rounding modes
    * legitimately disagree.
    */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame =
    vocabCoverageOf(Tables(spark, dir, "documents"))


  /** [[vocabCoverage]]'s kernel on any documents-shaped frame. */
  def vocabCoverageOf(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
    val vocab = toks.groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok"))
      .limit(VocabK)
      .select(col("tok"), lit(1).as("in_v"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_bp",
        expr("(n_oov * 10000) div n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** C29 `text_vocab_kl` — per-source vocabulary drift: KL divergence
    * of each source's token distribution from the corpus-wide one over
    * the corpus top-[[VocabK]] vocabulary plus an OOV bucket. The
    * domain-mixture diagnostic next to `corpus_mix`: A33's PSI watches
    * VALUE drift between time slices; this watches LEXICAL drift
    * between mixture components — a source with high KL is far from
    * the blend it feeds (different domain, different language,
    * boilerplate flood) and is the first place to look when the
    * mixture underperforms. Shares are Laplace-smoothed integer-count
    * rationals (c+1)/(n+V+1) with V the REALIZED vocab size (≤
    * [[VocabK]]; using the cap when fewer tokens exist would
    * sub-normalize both sides and let "KL" go negative), so empty
    * cells stay defined without an epsilon, both distributions sum to
    * exactly 1, and both engines form IDENTICAL doubles before the ln;
    * the ln itself is double math behind the shared round(·, 6)
    * guard. Scale shape: the fact-scale explode feeds (a) the O(V)
    * vocab head via TakeOrderedAndProject, (b) O(sources) totals, and
    * (c) map-side-combined (source × vocab-token) counts; the spine
    * join, OOV fold, and KL sum all run on O(sources × V) rows.
    */
  def textVocabKl(spark: SparkSession, dir: String): DataFrame =
    textVocabKlOf(Tables(spark, dir, "documents"))


  /** [[textVocabKl]]'s kernel on any documents-shaped frame. */
  def textVocabKlOf(docs: DataFrame): DataFrame =
    vocabKl(docs)

  /** [[textVocabKl]]'s core on any (source, text) frame. */
  def vocabKl(docs: DataFrame): DataFrame = vocabKlBy(docs, Seq("source"))

  /** The KL kernel over any component key (C30 `text_vocab_kl_lang`
    * slices by (source, lang) — per-language lexical drift INSIDE a
    * source, which a source-level score averages away).
    */
  def vocabKlBy(docs: DataFrame, keys: Seq[String]): DataFrame = {
    val kc = keys.map(col)
    // three independent consumers (vocab head, per-key totals,
    // in-vocab counts) read the fact-scale explode — cache it once or
    // each one re-scans and re-tokenizes the whole corpus. Measured
    // r15: do NOT spread the cache over the cores at bench SFs — a
    // repartition(32) before the persist doubled the wall (7.8 s vs
    // 3.6 s in the A/B shell probe): every consumer branch then runs
    // 32 tasks through its own exchange where the single-split cache
    // resolves each tiny branch in one task. A multi-file 100 TB
    // corpus splits (and so parallelizes) naturally at the scan.
    // Re-measured r16 at the factor-10 sf1 basis (multi-file corpus,
    // where the scan already splits): spread still loses — two A/B
    // rounds each way, (kl, kl_lang) walls CURRENT (6.8, 3.5) /
    // (3.1, 2.8) vs SPREAD (5.9, 11.0) / (7.6, 5.5) s — the
    // repartition pays a full-corpus exchange before the cache and
    // buys nothing the multi-split scan doesn't already give. Revert
    // stands on both bases.
    // r16 second A/B, also rejected: an EAGER SER checkpoint here
    // (the corpus_pipeline fix) cut task input 170 -> 101 MB at sf1
    // but tripled the wall (2.2/2.5 -> 7.0/6.0 s) — the lazy cache's
    // racing consumers effectively parallelize this otherwise
    // low-task-count query, and the checkpoint serializes it through
    // one explode materialization. Redundant scans are the cheaper
    // evil here (unlike corpus_pipeline, whose stampede re-read the
    // raw corpus for a wall-neutral trade).
    val tk = docs
      .select(kc :+ explode(TextOps.tokens(col("text"))).as("tok"): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = tk.groupBy(col("tok"))
      .agg(count(lit(1)).as("cq"))
      .orderBy(col("cq").desc, col("tok"))
      .limit(VocabK)
    val keyTotal = tk.groupBy(kc: _*).agg(count(lit(1)).as("ns"))
    val nTotal = keyTotal.agg(sum(col("ns")).as("n"))
    val keyVocab = tk
      .join(broadcast(vocab.select(col("tok"))), Seq("tok"))
      .groupBy(kc :+ col("tok"): _*)
      .agg(count(lit(1)).as("cs"))
    // dense (key × vocab) spine so absent tokens smooth to 1/(n+V+1)
    val cells = keyTotal.select(kc: _*)
      .crossJoin(broadcast(vocab))
      .join(keyVocab, keys :+ "tok", "left")
      .na.fill(0L, Seq("cs"))
    val vocabMass = vocab
      .agg(sum(col("cq")).as("vq"), count(lit(1)).as("vc"))
    // the bucket label is NULL — no whitespace token can ever be null,
    // so a corpus that literally contains the token "<oov>" (or any
    // other sentinel spelling) cannot collide with the bucket row
    val oov = cells.groupBy(kc: _*).agg(sum(col("cs")).as("vs"))
      .join(keyTotal, keys)
      .crossJoin(broadcast(vocabMass))
      .crossJoin(broadcast(nTotal))
      .select(kc ++ Seq(lit(null).cast("string").as("tok"),
        (col("ns") - col("vs")).as("cs"),
        (col("n") - col("vq")).as("cq")): _*)
    val terms = cells
      .select(kc ++ Seq(col("tok"), col("cs"), col("cq")): _*)
      .unionByName(oov)
      .join(keyTotal, keys)
      .crossJoin(broadcast(nTotal))
      .crossJoin(broadcast(vocabMass.select(col("vc"))))
      .withColumn("p",
        (col("cs") + lit(1.0)) / (col("ns") + col("vc") + lit(1.0)))
      .withColumn("q",
        (col("cq") + lit(1.0)) / (col("n") + col("vc") + lit(1.0)))
    terms.groupBy(kc: _*)
      .agg(max(col("ns")).as("n_tokens"),
        max(when(col("tok").isNull, col("cs"))).as("n_oov"),
        round(sum(col("p") * log(col("p") / col("q"))), 6).as("kl"))
      .orderBy(kc: _*)
  }

  /** C30 `text_vocab_kl_lang` — [[vocabKlBy]] keyed on
    * (source, lang): the drift diagnostic one level finer than C29.
    */
  def textVocabKlLang(spark: SparkSession, dir: String): DataFrame =
    textVocabKlLangOf(Tables(spark, dir, "documents"))


  /** [[textVocabKlLang]]'s kernel on any documents-shaped frame. */
  def textVocabKlLangOf(docs: DataFrame): DataFrame =
    vocabKlBy(docs, Seq("source", "lang"))

  val ContainTauBp = 7000 // containment threshold (basis points)

  /** D8 `dedup_containment` — DIRECTED near-duplicate detection:
    * containment C(a→b) = |shingles(a) ∩ shingles(b)| / |shingles(a)|
    * flags documents mostly INSIDE another (quotes, boilerplate
    * wrappers, subset pages) that symmetric Jaccard under-scores when
    * the container is much larger. Same scale shape as D2: inverted
    * index on 8-byte hashed shingles, df-capped buckets (≤ the D2 cap)
    * so no hot shingle fans out quadratically, exact counting of
    * candidate pairs only — never all pairs. Scores ship as exact
    * basis points.
    */
  def dedupContainment(spark: SparkSession, dir: String): DataFrame =
    dedupContainmentOf(Tables(spark, dir, "documents"))

  /** [[dedupContainment]]'s kernel on caller documents frame. */
  def dedupContainmentOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val wg = Window.partitionBy(col("g"))
    val ex = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"),
        explode(TextOps.wordShingles(TextOps.tokens(col("text")))).as("gs"))
      .select(col("doc_id"), xxhash64(col("gs")).as("g"))
      .withColumn("df", count(lit(1)).over(wg))
      .filter(col("df") <= graft.dedup.Dedup.MaxShingleDf)
      .select(col("doc_id"), col("g"))
      .localCheckpoint(true, MEMORY_AND_DISK_SER) // one materialization feeds sizes + both join sides
    val sz = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("na"))
    ex.as("a")
      .join(ex.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("ia"), col("b.doc_id").as("ib"))
      .agg(count(lit(1)).as("n_common"))
      .join(sz.select(col("doc_id").as("ia"), col("na")), "ia")
      .withColumn("containment_bp",
        expr("(n_common * 10000) div na"))
      .filter(col("containment_bp") >= ContainTauBp)
      .select(col("ia"), col("ib"), col("na"), col("n_common"),
        col("containment_bp"))
      .orderBy(col("ia"), col("ib"))
  }

  /** E13 `emb_whiten` — diagonal whitening for embedding curation:
    * per-dimension mean/std over the corpus, each vector re-expressed
    * in z-scores, then scored by whitened norm (how atypical) and max
    * |z| (is one dimension dominating — the rogue-feature signal).
    * Scale/determinism design: the cross-row moment sums are the ONE
    * place float addition order would leak the partitioning, so
    * components are quantized to exact integer micro-units
    * (floor(x·1e6) — floor, not round: floor of a double is
    * engine-exact) and summed as integers — order-independent,
    * engine-exact, statistically identical for curation. All per-row
    * math stays in deterministic double lanes (the emb_stats-proven
    * fold/dot idiom). Sums stay in i64 up to ~10^8 vectors; widen to
    * decimal partials beyond.
    */
  def embWhiten(spark: SparkSession, dir: String): DataFrame =
    embWhitenOf(Tables(spark, dir, "embeddings"))


  /** [[embWhiten]]'s kernel on any embeddings-shaped frame. */
  def embWhitenOf(emb: DataFrame): DataFrame = {
    val stats = emb
      .select(posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("d"),
        floor(col("x").cast("double") * lit(1e6)).cast("long").as("xi"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n"), sum(col("xi")).as("s1"),
        sum(expr("xi * xi")).as("s2"))
      .withColumn("mu",
        col("s1").cast("double") / (col("n").cast("double") * lit(1e6)))
      .withColumn("sd", sqrt(
        greatest(
          col("s2").cast("double") / (col("n").cast("double") * lit(1e12))
            - col("mu") * col("mu"),
          lit(0.0)) + lit(1e-9)))
    val arrs = stats
      .agg(
        array_sort(collect_list(struct(col("d"), col("mu")))).as("ms"),
        array_sort(collect_list(struct(col("d"), col("sd")))).as("ss"))
      .select(
        expr("transform(ms, e -> e.mu)").as("mu"),
        expr("transform(ss, e -> e.sd)").as("sd"))
    emb.crossJoin(broadcast(arrs))
      .withColumn("wv", expr(
        """zip_with(zip_with(embedding, mu,
          |  (x, m) -> cast(x as double) - m), sd, (c, s) -> c / s)"""
          .stripMargin))
      .select(col("vec_id"), col("label"),
        round(sqrt(expr(
          """aggregate(zip_with(wv, wv, (x, y) -> x * y),
            |  cast(0 as double), (acc, v) -> acc + v)""".stripMargin)), 4)
          .as("w_norm"),
        round(expr("array_max(transform(wv, x -> abs(x)))"), 4).as("z_max"))
      .orderBy(col("vec_id"))
  }

  val AnonK = 5 // minimum group size for k-anonymity

  /** A38 `etl_k_anonymity` — k-anonymity audit over quasi-identifiers
    * (the privacy gate that complements C6's PII scrub: scrubbing
    * removes DIRECT identifiers, this measures whether attribute
    * COMBINATIONS still single people out): customers grouped by the
    * QI tuple (nation, market segment, account-balance band); a group
    * smaller than [[AnonK]] is re-identifiable. The audit also
    * evaluates the standard remediation in the same pass —
    * GENERALIZATION to a coarser band (1000-band → 5000-band; the
    * coarse band nests the fine one since 5000 | 1000·5, so the
    * enclosing count is a window sum over the already-collapsed
    * frame, no second fact scan): risk_tier 0 = anonymous as-is,
    * 1 = anonymous after generalizing, 2 = suppress (even the coarse
    * group is small). One fact-scale groupBy to the O(QI-groups)
    * frame, one window over it — at 100 TB the audit costs one
    * map-side-combined shuffle. All counts and tiers integer-exact.
    */
  def etlKAnonymity(spark: SparkSession, dir: String): DataFrame =
    etlKAnonymityOf(Tables(spark, dir, "customer"))


  /** [[etlKAnonymity]]'s kernel on any customer-shaped frame. */
  def etlKAnonymityOf(cust: DataFrame): DataFrame = {
    val g1 = cust
      .groupBy(
        col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("band1"),
        floor(col("c_acctbal") / 5000).cast("long").as("band2"))
      .agg(count(lit(1)).as("n_users"))
    val w = Window.partitionBy(
      col("c_nationkey"), col("c_mktsegment"), col("band2"))
    g1.withColumn("n_gen", sum(col("n_users")).over(w))
      .withColumn("risk_tier",
        when(col("n_users") >= AnonK, 0)
          .when(col("n_gen") >= AnonK, 1)
          .otherwise(2))
      .select(col("c_nationkey"), col("c_mktsegment"), col("band1"),
        col("n_users"), col("n_gen"), col("risk_tier"))
      .orderBy(col("c_nationkey"), col("c_mktsegment"), col("band1"))
  }

  val DpEps = 1.0 // privacy budget ε
  val DpCap = 5L  // per-user per-cell contribution bound (sensitivity)

  /** A39 `etl_dp_counts` — differential-privacy-mechanism count
    * release (the aggregate-statistics complement of A38: k-anonymity
    * audits the raw table, this releases noised statistics): daily
    * event counts per type with (1) per-user contribution BOUNDING —
    * each user adds at most [[DpCap]] to any (type, day) cell, which
    * is what makes sensitivity finite and is the step naive "add
    * noise" implementations skip — and (2) Laplace(Δ/ε) noise via
    * inverse-CDF. The noise draw is SEEDED: the 4-hex-digit md5
    * uniform over the cell key (the house no-RNG-state contract —
    * corpus_sample's kernel), so the release is reproducible and the
    * DuckDB oracle replays it bit-for-bit; a production deployment
    * swaps ONE line (the uniform source) for a real RNG and everything
    * else — bounding, sensitivity, inverse CDF — is unchanged. Two
    * aggregations: fact → per-(cell, user) counts (one shuffle, the
    * expensive one, map-side combined), then the capped sum to the
    * O(types × days) frame; noise is a map-only expression on that
    * tiny frame. The ln() rides on exact integer-derived doubles
    * (identical u16 both engines) — the C29 guarded-ln precedent.
    */
  def etlDpCounts(spark: SparkSession, dir: String): DataFrame =
    etlDpCountsOf(Tables(spark, dir, "events"))


  /** [[etlDpCounts]]'s kernel on any events-shaped frame. */
  def etlDpCountsOf(events: DataFrame): DataFrame =
    dpCounts(events)

  /** [[etlDpCounts]]'s kernel on any events frame. */
  private[operators] def dpCounts(events: DataFrame): DataFrame = {
    val perUser = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"),
        col("user_id"))
      .agg(count(lit(1)).as("c"))
    val capped = perUser
      .groupBy(col("event_type"), col("day"))
      .agg(sum(least(col("c"), lit(DpCap))).as("n_capped"))
    val u16 = conv(substring(md5(concat(col("event_type"), lit(":"),
      col("day").cast("string")).cast("binary")), 1, 4), 16, 10)
      .cast("long")
    val cen = (u16.cast("double") + lit(0.5)) / lit(65536.0) - lit(0.5)
    val noise = lit(-DpCap / DpEps) * signum(cen) *
      log(lit(1.0) - lit(2.0) * abs(cen))
    capped
      .withColumn("released", round(col("n_capped") + noise, 4))
      .select(col("event_type"), col("day"), col("released"))
      .orderBy(col("event_type"), col("day"))
  }

  val AnonL = 3 // minimum distinct sensitive values per QI group

  /** A40 `anon_l_diversity` — l-diversity audit, the attribute-level
    * companion to A38's k-anonymity (k bounds RE-IDENTIFICATION —
    * how many people share my quasi-identifiers; l bounds ATTRIBUTE
    * DISCLOSURE — a group of 50 is still leaky if all 50 share one
    * sensitive value): customers grouped by the QI pair (nation,
    * account-balance 1000-band), sensitive attribute = market
    * segment. Per group: size, distinct sensitive values, and the
    * modal sensitive share in basis points (the homogeneity-attack
    * success rate), with `diverse` iff l ≥ [[AnonL]]. One
    * fact-scale groupBy to the O(QI × segment) frame (map-side
    * combined — at 100 TB this is the only shuffle), then a second
    * collapse of that tiny frame. All counts/shares integer-exact
    * (floor-division basis points, the house rule for ratios).
    */
  def anonLDiversity(spark: SparkSession, dir: String): DataFrame =
    anonLDiversityOf(Tables(spark, dir, "customer"))


  /** [[anonLDiversity]]'s kernel on any customer-shaped frame. */
  def anonLDiversityOf(cust: DataFrame): DataFrame =
    lDiversity(cust)

  /** [[anonLDiversity]]'s kernel on any customer-shaped frame. */
  private[operators] def lDiversity(customers: DataFrame): DataFrame = {
    val cells = customers
      .groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("band1"),
        col("c_mktsegment"))
      .agg(count(lit(1)).as("c"))
    cells
      .groupBy(col("c_nationkey"), col("band1"))
      .agg(sum(col("c")).as("n_users"),
        count(lit(1)).as("l_distinct"),
        max(col("c")).as("modal_c"))
      .select(col("c_nationkey"), col("band1"), col("n_users"),
        col("l_distinct"),
        expr("modal_c * 10000 div n_users").as("modal_share_bp"),
        (col("l_distinct") >= AnonL).as("diverse"))
      .orderBy(col("c_nationkey"), col("band1"))
  }

  val TCloseMilli = 200L // max tolerated per-class EMD (milli-units)

  /** A43 `anon_t_closeness` — t-closeness audit, the distribution-level
    * member of the privacy triad (A38 k bounds re-identification, A40
    * l bounds attribute DISTINCTNESS; t bounds attribute DISTRIBUTION —
    * a group can be large and l-diverse yet still leak because its
    * sensitive-value distribution differs sharply from the table's):
    * QI class = (nation, market segment), sensitive attribute = the
    * ORDERED account-balance 1000-band, distance = Earth Mover's
    * Distance, which for an ordered attribute is the mean absolute gap
    * between the class and global cumulative distributions.
    *
    * Integer-exact at any scale: both cumulatives quantize to
    * floor-division per-mille FIRST (1000·cum div n — the house rule
    * for ratios; also what keeps every operand within BIGINT at 100 TB,
    * where the cross-multiplied exact numerator cum_c·N would not be),
    * so the reported EMD is the per-mille-quantized mean gap —
    * deterministic on both engines by construction. Plan shape: one
    * fact-scale groupBy to the O(classes × bands) cell frame, a dense
    * class × band grid built from two collapsed tiny frames, windows
    * only over collapsed frames (the global band cumulative runs over
    * the O(bands) rollup — B63's rule), broadcast one-row totals.
    */
  def anonTCloseness(spark: SparkSession, dir: String): DataFrame =
    anonTClosenessOf(Tables(spark, dir, "customer"))


  /** [[anonTCloseness]]'s kernel on any customer-shaped frame. */
  def anonTClosenessOf(cust: DataFrame): DataFrame =
    tCloseness(cust)

  /** [[anonTCloseness]]'s kernel on any customer-shaped frame. */
  private[operators] def tCloseness(customers: DataFrame): DataFrame = {
    val cells = customers
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true, MEMORY_AND_DISK_SER) // one materialization feeds classes/gBands/join;
    // released with the session (no session-lifetime persist pin)
    val classes = cells.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(col("c")).as("n_c"))
    val gBands = cells.groupBy(col("band")).agg(sum(col("c")).as("g"))
    val wg = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gcum = gBands.withColumn("gcum", sum(col("g")).over(wg))
    val tot = gBands.agg(sum(col("g")).as("n_tot"),
      count(lit(1)).as("m"))
    val wc = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
      .orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    classes
      .crossJoin(broadcast(gcum))
      .join(cells, Seq("c_nationkey", "c_mktsegment", "band"), "left")
      .withColumn("cc", coalesce(col("c"), lit(0L)))
      .withColumn("ccum", sum(col("cc")).over(wc))
      .crossJoin(broadcast(tot))
      .withColumn("gap", abs(
        expr("ccum * 1000 div n_c") - expr("gcum * 1000 div n_tot")))
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(first(col("n_c")).as("n_users"),
        expr("sum(gap) div greatest(max(m) - 1, 1)").as("emd_milli"))
      .withColumn("t_ok", col("emd_milli") <= TCloseMilli)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  val BlockCap = 512 // max (token, brand) block size — the skew knob
  val LinkTau = 500  // milli-Jaccard match threshold

  /** A45 `link_blocking` — entity-resolution blocking + verify, the
    * record-linkage staple (Christen's two-stage shape every MDM /
    * dedupe-the-catalog pipeline runs): candidate pairs generate ONLY
    * inside composite blocking keys — (name token, brand) — then a
    * full-record similarity verifies each candidate; here two part
    * listings match when their name token sets agree at ≥
    * [[LinkTau]] milli-Jaccard ("the same product listed twice under
    * a brand", the duplicate-listing audit).
    *
    * Scale shape: the COMPOSITE key is the point — single-token
    * blocks grow linearly with the corpus (every block a skew bomb),
    * while token × brand keeps the per-block fan-out at
    * corpus/(vocab·brands); blocks above [[BlockCap]] records are
    * dropped entirely (D2's df-cap discipline: a key shared by
    * everyone carries no linkage signal — it only recalls pairs a
    * rarer key would also recall, or noise). The cap bounds the
    * O(Σ block²) candidate join at any SF; similarity then scores
    * FULL distinct token sets (the B84 lesson: caps thin candidates,
    * never scores) in exact floor-division milli-Jaccard. Verify
    * joins key on p_partkey; no stage holds an uncapped pair.
    */
  def linkBlocking(spark: SparkSession, dir: String): DataFrame =
    linkBlockingOf(Tables(spark, dir, "part"))


  /** [[linkBlocking]]'s kernel on any part-shaped frame. */
  def linkBlockingOf(parts: DataFrame): DataFrame =
    linkPairFrame(parts).orderBy(col("pa"), col("pb"))

  /** The unsorted matched-pair frame behind A45/A46: the verify chain
    * of [[linkPairPlanFrame]] materialized ONCE as a serialized
    * checkpoint. The checkpoint sits HERE — after the similarity
    * filter — because the matched frame is the chain's only small
    * surface (O(matched pairs)): every downstream consumer (the A45
    * presentation sort, whose range partitioner SAMPLES its child in
    * an extra pass; A46's CC edge build) re-reads megabytes instead
    * of re-running the candidate verify. The r13 spelling
    * checkpointed the pre-verify CANDIDATE set instead — O(Σ block²)
    * rows, 7.9 GB at factor 100 — and the sort's sampling pass read
    * it twice.
    */
  private[operators] def linkPairFrame(parts: DataFrame): DataFrame =
    linkPairPlanFrame(parts)
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)

  /** The matched-pair chain as a PLAN (no materialization) — the
    * spec's window into the executed shape; [[linkPairFrame]] is the
    * runtime entry.
    */
  private[graft] def linkPairPlanFrame(parts: DataFrame): DataFrame = {
    // recs is NOT checkpointed (r14 — the probe-measured reversal of
    // the r13 choice): it is a MAP-ONLY projection (split +
    // array_distinct, no aggregate), so per-consumer re-execution is
    // one column-pruned parquet scan (~246 MB at factor 100), while a
    // checkpoint re-read moves the materialized ROW-format frame
    // (~7.9 GB there — token arrays dominate) once per consumer with
    // no pruning: the r13 probe measured 32.6 GB of checkpoint input
    // against 1.86 GB of real shuffle. The blocking side's repeated
    // subtrees (toks → over → capped twice under the self-join)
    // dedup via ReuseExchange — identical exchange subtrees evaluate
    // once — so dropping the checkpoint adds scans, never shuffles.
    // p_name itself is dropped: only its token array is ever read.
    val recs = parts
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        array_distinct(split(col("p_name"), " ")).as("ts"))
    val toks = recs.select(col("p_partkey"), col("p_brand"),
      explode(col("ts")).as("tok"))
    // Block-size cap WITHOUT a window (r13 — the factor-100 probe
    // measured the count-over-window spelling spilling 44 GB: a
    // count window shuffles AND SORTS every (part, token) row on the
    // block key before emitting a per-row count). The groupBy
    // collapses map-side to one row per block — no sort anywhere —
    // and only the OVER-cap blocks (rare by construction: at most
    // tokens/BlockCap of them) come back to anti-join the token
    // stream, a hash join the planner broadcasts while they fit.
    // Row-identical to the window spelling; the oracles replay the
    // cap via their own HAVING count(*) <= cap.
    val over = toks.groupBy(col("tok"), col("p_brand"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > BlockCap)
      .select(col("tok"), col("p_brand"))
    // shuffle_hash on the self-join (r13, same probe): the default
    // sort-merge join SORTS both corpus-sized token streams on the
    // block key — the probe's remaining ~40 GB spill. A per-partition
    // hash build never sorts, and its build side is safe by
    // construction: blocks are ≤ BlockCap rows, so no single key can
    // blow a partition's map, and partition volume is the cluster's
    // shuffle-partition sizing knob.
    val capped = toks.join(over, Seq("tok", "p_brand"), "left_anti")
      .hint("shuffle_hash")
      // user-specified block-key repartition with an EXPLICIT count
      // (r13, per-stage spill attribution): AQE sizes the pair stage
      // off its ~100 MB INPUT and coalesced it to a handful of
      // tasks, blind to the ~17× in-block pair fan-out — the same
      // trap the knn-graph scoring join documents. Only a
      // numPartitions-pinned repartition is exempt from AQE
      // coalescing (the bare column form is still optimizable), so
      // pin it to the session's shuffle-partition setting — the knob
      // a cluster sizes to the data, which is exactly what bounds
      // the distinct's per-task partial state here. Trade-off: the
      // pin also opts this skew-prone stage out of AQE skew
      // splitting — acceptable because blocks are ≤ BlockCap rows by
      // construction, so no key can dominate a partition. The conf
      // can resolve non-numeric on some deployments ("auto"); fall
      // back to the cluster's default parallelism (r14 ADVICE).
      .repartition(recs.sparkSession.conf
        .getOption("spark.sql.shuffle.partitions")
        .flatMap(_.toIntOption)
        .getOrElse(recs.sparkSession.sparkContext.defaultParallelism),
        col("tok"), col("p_brand"))
    val cand = capped.as("a")
      .join(capped.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.p_brand") === col("b.p_brand") &&
          col("a.p_partkey") < col("b.p_partkey"))
      .select(col("a.p_partkey").as("pa"), col("b.p_partkey").as("pb"))
      // the distinct's output feeds the verify joins in ONE pipelined
      // pass (they hash/broadcast on the record side), so the
      // candidate set is never materialized — r14 moved the chain's
      // single checkpoint to the post-verify matched frame (see
      // linkPairFrame). The r13 measurement that motivated a
      // checkpoint here (the distinct re-executing per consumer,
      // 43 GB spill) arose from MULTIPLE consumers of the verify
      // output; with the matched frame checkpointed there is exactly
      // one end-to-end execution of this chain per query.
      .distinct()
    cand
      .join(recs.select(col("p_partkey").as("pa"), col("ts").as("ta"),
        col("p_type").as("type_a")), Seq("pa"))
      .join(recs.select(col("p_partkey").as("pb"), col("ts").as("tb"),
        col("p_type").as("type_b")), Seq("pb"))
      .withColumn("n_common",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("n_union",
        (size(col("ta")) + size(col("tb"))).cast("long") - col("n_common"))
      .withColumn("milli_jaccard", expr("n_common * 1000 div n_union"))
      .filter(col("milli_jaccard") >= LinkTau)
      .select(col("pa"), col("pb"), col("milli_jaccard"),
        (col("type_a") === col("type_b")).cast("int").as("same_type"))
  }

  /** A46 `link_entities` — the RESOLUTION step on top of A45's
    * matched pairs (blocking + verify yields pairs; master-data
    * management wants the ENTITY: one golden-record group per real-
    * world product, transitively closed — A matches B and B matches C
    * puts all three in one entity even when A–C alone misses the
    * [[LinkTau]] threshold, exactly the chain survivorship rules are
    * written against). A45's pair frame becomes an edge list resolved
    * by the SAME `Dedup.connectedComponents` hybrid kernel D6/D14 use
    * (reused, not re-implemented — driver union-find below the edge
    * bound, iterative min-label propagation with lineage truncation
    * above); output one row per linked record with its canonical
    * min-partkey entity id and entity size — the survivorship frame a
    * dedupe-the-catalog pipeline merges from. Scale shape: everything
    * up to the edge list is A45's capped-block plan; the CC kernel
    * sees only the O(matched pairs) edges, never the part table.
    */
  def linkEntities(spark: SparkSession, dir: String): DataFrame =
    linkEntitiesOf(Tables(spark, dir, "part"))


  /** The (p_partkey, entity_id) label frame behind A46/A47. */
  private[operators] def linkEntityLabels(parts: DataFrame): DataFrame =
    graft.dedup.Dedup.connectedComponents(
        linkPairFrame(parts).select(col("pa").as("u"), col("pb").as("v")))
      .select(col("node").as("p_partkey"), col("label").as("entity_id"))

  /** [[linkEntities]]'s kernel on any part-shaped frame. */
  def linkEntitiesOf(parts: DataFrame): DataFrame = {
    val wc = Window.partitionBy(col("entity_id"))
    linkEntityLabels(parts)
      .withColumn("entity_size", count(lit(1)).over(wc))
      .orderBy(col("p_partkey"))
  }

  /** A47 `link_survivorship` — GOLDEN-RECORD construction per A46
    * entity, the step MDM pipelines call survivorship (A45 finds
    * pairs, A46 groups them; a catalog still needs ONE canonical
    * record per entity, assembled from the members by deterministic
    * per-attribute rules): most-frequent name wins (count-desc,
    * value-asc tiebreak — the mode rule), the anchor record (min
    * partkey — production's "most trusted source" slot) donates its
    * type, the price range survives as min/max integer cents (the
    * dispersion a pricing audit reads), and the distinct-type count
    * flags attribute conflicts needing a steward. Brand is uniform by
    * construction (A45 blocks within brand, so components are
    * brand-homogeneous) and carried via min. Scale shape: A46's label
    * frame joins part on the key, then TWO collapses to the
    * O(entities) frame (one attribute-mode rank over (entity, name)
    * counts, one rollup); windows only over collapsed frames.
    */
  def linkSurvivorship(spark: SparkSession, dir: String): DataFrame =
    linkSurvivorshipOf(Tables(spark, dir, "part"))


  /** [[linkSurvivorship]]'s kernel on any part-shaped frame. */
  def linkSurvivorshipOf(parts: DataFrame): DataFrame = {
    val m = linkEntityLabels(parts)
      .join(parts, Seq("p_partkey"))
      .withColumn("cents",
        expr("cast(round(p_retailprice * 100) as bigint)"))
    val nameCnt = m.groupBy(col("entity_id"), col("p_name"))
      .agg(count(lit(1)).as("c"))
    val wn = Window.partitionBy(col("entity_id"))
      .orderBy(col("c").desc, col("p_name"))
    val golden = nameCnt
      .withColumn("rn", row_number().over(wn))
      .filter(col("rn") === 1)
      .select(col("entity_id"), col("p_name").as("name_golden"))
    m.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_records"),
        min(col("p_brand")).as("brand"),
        min_by(col("p_type"), col("p_partkey")).as("type_anchor"),
        countDistinct(col("p_type")).as("n_types"),
        min(col("cents")).as("price_min_cents"),
        max(col("cents")).as("price_max_cents"))
      .join(golden, Seq("entity_id"))
      .select(col("entity_id"), col("n_records"), col("name_golden"),
        col("brand"), col("type_anchor"), col("n_types"),
        col("price_min_cents"), col("price_max_cents"))
      .orderBy(col("entity_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "link_survivorship" -> (linkSurvivorship _),
    "link_entities" -> (linkEntities _),
    "link_blocking" -> (linkBlocking _),
    "anon_t_closeness" -> (anonTCloseness _),
    "anon_l_diversity" -> (anonLDiversity _),
    "etl_dp_counts" -> (etlDpCounts _),
    "etl_k_anonymity" -> (etlKAnonymity _),
    "etl_late_data" -> (etlLateData _),
    "interval_join_bucketed" -> (intervalJoinBucketed _),
    "vocab_coverage" -> (vocabCoverage _),
    "text_vocab_kl" -> (textVocabKl _),
    "text_vocab_kl_lang" -> (textVocabKlLang _),
    "dedup_containment" -> (dedupContainment _),
    "emb_whiten" -> (embWhiten _)
  )

  /** A45's blocking + verify chain as a shared oracle CTE prefix
    * (A46 resolves the same pair set into entities).
    */
  private[operators] val linkPairsCte: String =
    s"""r AS (SELECT p_partkey, p_brand, p_type,
       |    list_distinct(string_split(p_name, ' ')) AS ts
       |  FROM part),
       |toks AS (SELECT p_partkey, p_brand, unnest(ts) AS tok FROM r),
       |bl AS (SELECT tok, p_brand FROM toks GROUP BY tok, p_brand
       |  HAVING count(*) <= $BlockCap),
       |ct AS (SELECT t.p_partkey, t.p_brand, t.tok
       |  FROM toks t JOIN bl USING (tok, p_brand)),
       |cand AS (SELECT DISTINCT a.p_partkey AS pa, b.p_partkey AS pb
       |  FROM ct a JOIN ct b ON a.tok = b.tok
       |    AND a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey),
       |v AS (SELECT c.pa, c.pb,
       |    CAST(len(list_intersect(x.ts, y.ts)) AS BIGINT) AS n_common,
       |    CAST(len(x.ts) + len(y.ts) AS BIGINT)
       |      - CAST(len(list_intersect(x.ts, y.ts)) AS BIGINT)
       |      AS n_union,
       |    CASE WHEN x.p_type = y.p_type THEN 1 ELSE 0 END AS same_type
       |  FROM cand c JOIN r x ON x.p_partkey = c.pa
       |    JOIN r y ON y.p_partkey = c.pb)""".stripMargin

  /** A46/A47's shared entity-resolution suffix: matched pairs →
    * symmetric edges → recursive reach → min-label entities
    * (expects [[linkPairsCte]]'s `v` in scope).
    */
  private[operators] val linkEntityCte: String =
    s"""mp AS (SELECT pa, pb FROM v
       |  WHERE n_common * 1000 // n_union >= $LinkTau),
       |edges AS (SELECT pa AS eu, pb AS ev FROM mp
       |  UNION SELECT pb, pa FROM mp),
       |reach(eu, rr) AS (
       |  SELECT eu, eu FROM (SELECT DISTINCT eu FROM edges)
       |  UNION
       |  SELECT e2.eu, reach.rr FROM edges e2
       |    JOIN reach ON reach.eu = e2.ev),
       |res AS (SELECT eu AS p_partkey, min(rr) AS entity_id
       |  FROM reach GROUP BY eu)""".stripMargin

  val oracle: Map[String, String] = Map(
    // A45: composite (token, brand) blocks with the same cap, verify
    // on full distinct token sets, floor-division milli-Jaccard
    "link_blocking" ->
      s"""WITH $linkPairsCte
         |SELECT pa, pb, n_common * 1000 // n_union AS milli_jaccard,
         |  same_type
         |FROM v WHERE n_common * 1000 // n_union >= $LinkTau
         |ORDER BY pa, pb""".stripMargin,
    // A46: A45's matched pairs closed transitively by the D6/D14
    // recursive reach (bounded: the matched-pair graph is tiny — the
    // block cap and the 0.5 Jaccard bar keep it to true near-copies)
    "link_entities" ->
      s"""WITH RECURSIVE $linkPairsCte,
         |$linkEntityCte
         |SELECT p_partkey, entity_id,
         |  count(*) OVER (PARTITION BY entity_id) AS entity_size
         |FROM res ORDER BY p_partkey""".stripMargin,
    // A47: the same entity labels joined back to part, then the
    // survivorship rules — name mode (count desc, value asc), anchor
    // type (min partkey), min/max integer cents, distinct-type width
    "link_survivorship" ->
      s"""WITH RECURSIVE $linkPairsCte,
         |$linkEntityCte,
         |m AS (SELECT res.entity_id, p.*,
         |    CAST(round(p.p_retailprice * 100) AS BIGINT) AS cents
         |  FROM res JOIN part p USING (p_partkey)),
         |nc AS (SELECT entity_id, p_name, count(*) AS c
         |  FROM m GROUP BY 1, 2),
         |gn AS (SELECT entity_id, p_name AS name_golden FROM (
         |    SELECT entity_id, p_name, row_number() OVER (
         |      PARTITION BY entity_id ORDER BY c DESC, p_name) AS rn
         |    FROM nc) WHERE rn = 1),
         |an AS (SELECT entity_id, p_type AS type_anchor FROM (
         |    SELECT entity_id, p_type, row_number() OVER (
         |      PARTITION BY entity_id ORDER BY p_partkey) AS rn
         |    FROM m) WHERE rn = 1),
         |ag AS (SELECT entity_id, count(*) AS n_records,
         |    min(p_brand) AS brand,
         |    count(DISTINCT p_type) AS n_types,
         |    min(cents) AS price_min_cents,
         |    max(cents) AS price_max_cents
         |  FROM m GROUP BY entity_id)
         |SELECT ag.entity_id, ag.n_records, gn.name_golden, ag.brand,
         |  an.type_anchor, ag.n_types, ag.price_min_cents,
         |  ag.price_max_cents
         |FROM ag JOIN gn USING (entity_id) JOIN an USING (entity_id)
         |ORDER BY ag.entity_id""".stripMargin,
    // A43: dense class × band grid, per-mille-quantized cumulative
    // gaps (floor division — exact both engines), EMD = mean gap
    "anon_t_closeness" ->
      s"""WITH cells AS (SELECT c_nationkey, c_mktsegment,
         |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM customer GROUP BY 1, 2, 3),
         |classes AS (SELECT c_nationkey, c_mktsegment,
         |    CAST(sum(c) AS BIGINT) AS n_c
         |  FROM cells GROUP BY 1, 2),
         |gb AS (SELECT band, CAST(sum(c) AS BIGINT) AS g
         |  FROM cells GROUP BY band),
         |gcum AS (SELECT band, CAST(sum(g) OVER (ORDER BY band
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS gcum
         |  FROM gb),
         |tot AS (SELECT CAST(sum(g) AS BIGINT) AS n_tot,
         |    CAST(count(*) AS BIGINT) AS m
         |  FROM gb),
         |grid AS (SELECT cl.c_nationkey, cl.c_mktsegment, cl.n_c,
         |    g.band, g.gcum, coalesce(ce.c, 0) AS cc
         |  FROM classes cl CROSS JOIN gcum g
         |  LEFT JOIN cells ce ON ce.c_nationkey = cl.c_nationkey
         |    AND ce.c_mktsegment = cl.c_mktsegment AND ce.band = g.band),
         |cum AS (SELECT *, CAST(sum(cc) OVER (
         |    PARTITION BY c_nationkey, c_mktsegment ORDER BY band
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS ccum
         |  FROM grid),
         |gaps AS (SELECT c_nationkey, c_mktsegment, n_c, m,
         |    abs(ccum * 1000 // n_c - gcum * 1000 // n_tot) AS gap
         |  FROM cum CROSS JOIN tot)
         |SELECT c_nationkey, c_mktsegment,
         |  CAST(max(n_c) AS BIGINT) AS n_users,
         |  CAST(sum(gap) // greatest(max(m) - 1, 1) AS BIGINT)
         |    AS emd_milli,
         |  CAST(sum(gap) // greatest(max(m) - 1, 1) AS BIGINT)
         |    <= $TCloseMilli AS t_ok
         |FROM gaps GROUP BY 1, 2
         |ORDER BY c_nationkey, c_mktsegment""".stripMargin,
    "anon_l_diversity" ->
      s"""WITH cells AS (SELECT c_nationkey,
         |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS band1,
         |    c_mktsegment, count(*) AS c
         |  FROM customer GROUP BY 1, 2, 3)
         |SELECT c_nationkey, band1,
         |  CAST(sum(c) AS BIGINT) AS n_users,
         |  CAST(count(*) AS BIGINT) AS l_distinct,
         |  CAST(max(c) * 10000 // CAST(sum(c) AS BIGINT) AS BIGINT)
         |    AS modal_share_bp,
         |  count(*) >= $AnonL AS diverse
         |FROM cells GROUP BY c_nationkey, band1
         |ORDER BY c_nationkey, band1""".stripMargin,
    "etl_dp_counts" ->
      s"""WITH pu AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |    user_id, count(*) AS c
         |  FROM events GROUP BY 1, 2, 3),
         |cap AS (SELECT event_type, day,
         |    sum(least(c, $DpCap)) AS n_capped
         |  FROM pu GROUP BY 1, 2),
         |n AS (SELECT event_type, day, n_capped,
         |    CAST((strpos('0123456789abcdef', substr(md5(event_type ||
         |        ':' || strftime(day, '%Y-%m-%d')), 1, 1)) - 1) * 4096
         |      + (strpos('0123456789abcdef', substr(md5(event_type ||
         |        ':' || strftime(day, '%Y-%m-%d')), 2, 1)) - 1) * 256
         |      + (strpos('0123456789abcdef', substr(md5(event_type ||
         |        ':' || strftime(day, '%Y-%m-%d')), 3, 1)) - 1) * 16
         |      + (strpos('0123456789abcdef', substr(md5(event_type ||
         |        ':' || strftime(day, '%Y-%m-%d')), 4, 1)) - 1)
         |      AS BIGINT) AS u16
         |  FROM cap)
         |SELECT event_type, day,
         |  round(n_capped + (-${DpCap.toDouble} / $DpEps)
         |    * sign((u16 + 0.5) / 65536.0 - 0.5)
         |    * ln(1.0 - 2.0 * abs((u16 + 0.5) / 65536.0 - 0.5)), 4)
         |    AS released
         |FROM n ORDER BY event_type, day""".stripMargin,
    "etl_k_anonymity" ->
      s"""WITH g1 AS (SELECT c_nationkey, c_mktsegment,
         |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS band1,
         |    CAST(floor(c_acctbal / 5000) AS BIGINT) AS band2,
         |    count(*) AS n_users
         |  FROM customer GROUP BY 1, 2, 3, 4),
         |g AS (SELECT *, sum(n_users) OVER (PARTITION BY c_nationkey,
         |    c_mktsegment, band2) AS n_gen FROM g1)
         |SELECT c_nationkey, c_mktsegment, band1,
         |  CAST(n_users AS BIGINT) AS n_users,
         |  CAST(n_gen AS BIGINT) AS n_gen,
         |  CASE WHEN n_users >= $AnonK THEN 0
         |    WHEN n_gen >= $AnonK THEN 1 ELSE 2 END AS risk_tier
         |FROM g
         |ORDER BY c_nationkey, c_mktsegment, band1""".stripMargin,
    "etl_late_data" ->
      """WITH w AS (SELECT user_id, event_id, ts,
        |    max(ts) OVER (PARTITION BY user_id ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm
        |  FROM events),
        |l AS (SELECT user_id,
        |    CASE WHEN ts < wm - INTERVAL 10 MINUTE THEN 1 ELSE 0 END
        |      AS late,
        |    CASE WHEN ts < wm - INTERVAL 10 MINUTE
        |      THEN (epoch_us(wm) - epoch_us(ts)) // 1000000
        |      ELSE 0 END AS late_sec
        |  FROM w)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(late) AS BIGINT) AS n_late,
        |  CAST(max(late_sec) AS BIGINT) AS max_late_sec
        |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin,
    // interval_join_bucketed: the oracle rides the SAME bucketization
    // as the operator (round 12) — [d, d+6] inclusive explodes to its
    // 7 covered days, then a date equi join. The raw BETWEEN theta
    // spelling is O(urgent·lineitem) comparisons and timed out the
    // sf1 gate's 600 s watchdog; this spelling is equality-hashable
    // (verified row-identical at sf0.01, 2.3× faster there already).
    "interval_join_bucketed" ->
      """WITH od AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0,
        |    unnest(range(0, 7)) AS d
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |o7 AS (SELECT o_orderkey, d0 + CAST(d AS INT) AS dt FROM od)
        |SELECT o.o_orderkey, count(*) AS n_shipments,
        |  round(sum(l.l_quantity), 2) AS sum_qty
        |FROM o7 o JOIN lineitem l ON CAST(l.l_shipdate AS DATE) = o.dt
        |GROUP BY o.o_orderkey ORDER BY o.o_orderkey""".stripMargin,
    "vocab_coverage" ->
      """WITH t AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |v AS (SELECT tok FROM (
        |    SELECT tok, count(*) AS c FROM t GROUP BY tok
        |    ORDER BY c DESC, tok LIMIT 100)),
        |j AS (SELECT t.doc_id,
        |    CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM t LEFT JOIN v ON t.tok = v.tok)
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(oov) AS BIGINT) AS n_oov,
        |  CAST((sum(oov) * 10000) // count(*) AS BIGINT) AS oov_bp
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // text_vocab_kl: same top-V vocab head as vocab_coverage, dense
    // source×vocab spine + OOV bucket, Laplace rationals, guarded ln
    "text_vocab_kl" ->
      """WITH t AS (SELECT source,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |v AS (SELECT tok, c AS cq FROM (
        |    SELECT tok, count(*) AS c FROM t GROUP BY tok
        |    ORDER BY c DESC, tok LIMIT 100)),
        |st AS (SELECT source, count(*) AS ns FROM t GROUP BY source),
        |nt AS (SELECT CAST(sum(ns) AS BIGINT) AS n FROM st),
        |sv AS (SELECT t.source, t.tok, count(*) AS cs
        |  FROM t JOIN v ON t.tok = v.tok GROUP BY 1, 2),
        |cells AS (SELECT s.source, v.tok,
        |    CAST(coalesce(sv.cs, 0) AS BIGINT) AS cs,
        |    CAST(v.cq AS BIGINT) AS cq
        |  FROM (SELECT source FROM st) s CROSS JOIN v
        |  LEFT JOIN sv ON sv.source = s.source AND sv.tok = v.tok),
        |vm AS (SELECT CAST(sum(cq) AS BIGINT) AS vq,
        |    count(*) AS vc FROM v),
        |oov AS (SELECT c.source, CAST(NULL AS VARCHAR) AS tok,
        |    CAST(st.ns - sum(c.cs) AS BIGINT) AS cs,
        |    CAST(nt.n - vm.vq AS BIGINT) AS cq
        |  FROM cells c JOIN st USING (source)
        |  CROSS JOIN vm CROSS JOIN nt
        |  GROUP BY c.source, st.ns, vm.vq, nt.n),
        |terms AS (SELECT u.source, u.tok, u.cs, u.cq, st.ns, nt.n,
        |    (u.cs + 1.0) / (st.ns + vm.vc + 1.0) AS p,
        |    (u.cq + 1.0) / (nt.n + vm.vc + 1.0) AS q
        |  FROM (SELECT * FROM cells UNION ALL SELECT * FROM oov) u
        |  JOIN st USING (source) CROSS JOIN nt CROSS JOIN vm)
        |SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens,
        |  max(CASE WHEN tok IS NULL THEN cs END) AS n_oov,
        |  round(sum(p * ln(p / q)), 6) AS kl
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,
    // text_vocab_kl_lang: the same kernel keyed on (source, lang)
    "text_vocab_kl_lang" ->
      """WITH t AS (SELECT source, lang,
        |    unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |v AS (SELECT tok, c AS cq FROM (
        |    SELECT tok, count(*) AS c FROM t GROUP BY tok
        |    ORDER BY c DESC, tok LIMIT 100)),
        |st AS (SELECT source, lang, count(*) AS ns FROM t GROUP BY 1, 2),
        |nt AS (SELECT CAST(sum(ns) AS BIGINT) AS n FROM st),
        |sv AS (SELECT t.source, t.lang, t.tok, count(*) AS cs
        |  FROM t JOIN v ON t.tok = v.tok GROUP BY 1, 2, 3),
        |cells AS (SELECT s.source, s.lang, v.tok,
        |    CAST(coalesce(sv.cs, 0) AS BIGINT) AS cs,
        |    CAST(v.cq AS BIGINT) AS cq
        |  FROM (SELECT source, lang FROM st) s CROSS JOIN v
        |  LEFT JOIN sv ON sv.source = s.source AND sv.lang = s.lang
        |    AND sv.tok = v.tok),
        |vm AS (SELECT CAST(sum(cq) AS BIGINT) AS vq,
        |    count(*) AS vc FROM v),
        |oov AS (SELECT c.source, c.lang, CAST(NULL AS VARCHAR) AS tok,
        |    CAST(st.ns - sum(c.cs) AS BIGINT) AS cs,
        |    CAST(nt.n - vm.vq AS BIGINT) AS cq
        |  FROM cells c JOIN st USING (source, lang)
        |  CROSS JOIN vm CROSS JOIN nt
        |  GROUP BY c.source, c.lang, st.ns, vm.vq, nt.n),
        |terms AS (SELECT u.source, u.lang, u.tok, u.cs, u.cq, st.ns,
        |    nt.n,
        |    (u.cs + 1.0) / (st.ns + vm.vc + 1.0) AS p,
        |    (u.cq + 1.0) / (nt.n + vm.vc + 1.0) AS q
        |  FROM (SELECT * FROM cells UNION ALL SELECT * FROM oov) u
        |  JOIN st USING (source, lang) CROSS JOIN nt CROSS JOIN vm)
        |SELECT source, lang, CAST(max(ns) AS BIGINT) AS n_tokens,
        |  max(CASE WHEN tok IS NULL THEN cs END) AS n_oov,
        |  round(sum(p * ln(p / q)), 6) AS kl
        |FROM terms GROUP BY source, lang
        |ORDER BY source, lang""".stripMargin,
    "dedup_containment" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') w
        |    FROM documents),
        |s AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |    THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |      for i in range(1, len(w) - 1)] ELSE [] END) sh FROM t),
        |e0 AS (SELECT doc_id, unnest(sh) g FROM s),
        |keep AS (SELECT g FROM e0 GROUP BY g HAVING count(*) <= 50),
        |e AS (SELECT e0.* FROM e0 JOIN keep USING (g)),
        |sz AS (SELECT doc_id, count(*) na FROM e GROUP BY doc_id),
        |p AS (SELECT a.doc_id ia, b.doc_id ib, count(*) n_common
        |  FROM e a JOIN e b ON a.g = b.g AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT ia, ib, sa.na, n_common,
        |  CAST((n_common * 10000) // sa.na AS BIGINT) AS containment_bp
        |FROM p JOIN sz sa ON sa.doc_id = ia
        |WHERE (n_common * 10000) // sa.na >= 7000
        |ORDER BY ia, ib""".stripMargin,
    "emb_whiten" ->
      """WITH e AS (SELECT
        |    unnest(range(1, len(embedding) + 1)) AS d,
        |    unnest([CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)
        |      for x in embedding]) AS xi
        |  FROM embeddings),
        |s AS (SELECT d, count(*) AS n, sum(xi) AS s1, sum(xi * xi) AS s2
        |  FROM e GROUP BY d),
        |st AS (SELECT d,
        |    CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6) AS mu,
        |    sqrt(greatest(
        |      CAST(s2 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12)
        |        - (CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6))
        |          * (CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * 1e6)),
        |      0.0) + 1e-9) AS sd
        |  FROM s),
        |a AS (SELECT list(mu ORDER BY d) AS mu, list(sd ORDER BY d) AS sd
        |  FROM st),
        |w AS (SELECT vec_id, label,
        |    [(CAST(embedding[i] AS DOUBLE) - a.mu[i]) / a.sd[i]
        |      for i in range(1, len(embedding) + 1)] AS wv
        |  FROM embeddings CROSS JOIN a)
        |SELECT vec_id, label,
        |  round(sqrt(list_dot_product(wv, wv)), 4) AS w_norm,
        |  round(list_max([abs(x) for x in wv]), 4) AS z_max
        |FROM w ORDER BY vec_id""".stripMargin
  )
}
