package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER

/** Streaming operators (SURVEY.md §2.G). Each has a batch-equivalent
  * query (oracle-checked by the driver) and a genuine Structured
  * Streaming transform (spec-tested with MemoryStream) — the same
  * aggregation logic runs in both modes, which is the Spark contract
  * for incremental pipelines.
  */
object Streaming {

  /** Streaming transform behind G1: tumbling 1-hour windows with a
    * 2-hour watermark; works on any frame with (ts, event_type, value).
    */
  def windowCountsTransform(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      // exact integer-cent sums (r14 sweep): (window, type) groups are
      // fact-scale, and the long state is also the cheaper streaming
      // accumulator; one shared transform keeps stream ≡ batch
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0)
          .as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** G1 `stream_window_counts` — tumbling-window aggregation, batch
    * mode. Pre-aggregates map-side per (window, type): the shuffle
    * carries one row per group per partition.
    */
  def windowCounts(spark: SparkSession, dir: String): DataFrame =
    windowCountsOf(Tables(spark, dir, "events"))


  /** [[windowCounts]]'s kernel on any events-shaped frame. */
  def windowCountsOf(events: DataFrame): DataFrame =
    windowCountsTransform(events)
      .orderBy(col("window_start"), col("event_type"))

  /** G2 `stream_first_seen` — daily new-key counts: each key's first
    * event day (the reference's "new opportunities today" alert,
    * aiesec.py:142, as a continuous metric). min-aggregate per key,
    * then a tiny per-day rollup.
    */
  def firstSeen(spark: SparkSession, dir: String): DataFrame =
    firstSeenOf(Tables(spark, dir, "events"))


  /** [[firstSeen]]'s kernel on any events-shaped frame. */
  def firstSeenOf(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_ts"))
      .groupBy(to_date(col("first_ts")).as("first_day"))
      .agg(count(lit(1)).as("n_new_keys"))
      .orderBy(col("first_day"))

  /** G5 streaming exact dedup: drop re-deliveries of the same key while
    * it is still inside the watermark horizon — the standard
    * at-least-once → effectively-once repair stage in front of any
    * streaming sink. State per key expires with the watermark, so state
    * size is bounded by (keys/hour × horizon), not by stream length.
    */
  def dedupStreamTransform(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** G10 streaming sketch maintenance: the incremental arm of the B35
    * HLL sketch table, run live — per-(hour-window, type) HLL register
    * partials maintained by the state store as events arrive, emitting
    * the KB-sized mergeable sketch rows a periodic batch rollup then
    * merges for any time-range distinct-count question (the archive is
    * never rescanned; exactly the B35 contract, incrementally fed).
    * Register-max merge is associative AND idempotent, so stream-built
    * partials merge to the SAME estimate a batch pass over the same
    * rows produces — pinned in spec.
    */
  def sketchMaintenanceTransform(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(graft.functions.HllSketch.hllAgg(col("user_id")).as("sk"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("sk"))

  /** G5 `stream_dedup` — batch equivalent: one survivor per event_id
    * (min ts, then min value as the deterministic tiebreak).
    */
  def dedupStream(spark: SparkSession, dir: String): DataFrame =
    dedupStreamOf(Tables(spark, dir, "events"))


  /** [[dedupStream]]'s kernel on any events-shaped frame. */
  def dedupStreamOf(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_id"))
      .agg(min(col("ts")).as("first_ts"), count(lit(1)).as("n_seen"))
      .orderBy(col("event_id"))

  val JoinHorizonMin = 30

  /** G7 stream-stream interval join (view→click attribution): each
    * click pairs with the same user's views from the preceding
    * [[JoinHorizonMin]] minutes. Both sides carry watermarks and the
    * join predicate bounds event-time distance, which is exactly what
    * lets Structured Streaming expire buffered state: a view older than
    * (watermark − horizon) can never match again and is dropped, so
    * state is bounded by rate × horizon, not stream length.
    */
  def attributionJoinTransform(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    val c = clicks
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
    v.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") < col("v_ts") + expr(s"INTERVAL $JoinHorizonMin MINUTES"))
      .select(col("user_id"), col("view_id"), col("click_id"),
        col("v_ts"), col("c_ts"))
  }

  /** G7 `stream_join` — batch equivalent of the attribution join over
    * the events table. One user_id shuffle feeds a sort-merge join;
    * the interval predicate stays a join-time filter.
    */
  def streamJoin(spark: SparkSession, dir: String): DataFrame =
    streamJoinOf(Tables(spark, dir, "events"))


  /** [[streamJoin]]'s kernel on any events-shaped frame. */
  def streamJoinOf(events: DataFrame): DataFrame = {
    val ev = events
    attributionJoinTransform(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "click"))
      .orderBy(col("user_id"), col("view_id"), col("click_id"))
  }

  /** Rank stage behind G8: top 3 event types per closed window. Rank
    * is NOT streamable (a window function needs the whole partition),
    * so this runs over CLOSED windows only — in a live pipeline it sits
    * in `foreachBatch` over the append-mode output of
    * [[windowCountsTransform]], where every arriving row belongs to a
    * window the watermark has already sealed.
    */
  def topkPerWindow(windowed: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_start"))
      .orderBy(col("n_events").desc, col("event_type"))
    windowed
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("window_start"), col("event_type"), col("n_events"),
        col("rk"))
  }

  /** G8 `stream_topk` — hottest event types per tumbling hour: the
    * windowed aggregation is the streaming half (bounded state via
    * watermark), the per-window rank the foreachBatch half. Batch mode
    * runs both back to back; the window-count pre-aggregation means the
    * rank's shuffle carries O(windows × types) rows, not events.
    */
  def streamTopk(spark: SparkSession, dir: String): DataFrame =
    streamTopkOf(Tables(spark, dir, "events"))


  /** [[streamTopk]]'s kernel on any events-shaped frame. */
  def streamTopkOf(events: DataFrame): DataFrame =
    topkPerWindow(windowCountsTransform(events))
      .orderBy(col("window_start"), col("rk"))

  /** G15 `stream_substring_dedup` — batch equivalent of
    * [[SubstringDedupStream]]'s keep-first rule: per document, how
    * many of its sliding 16-token windows repeat a window FIRST
    * claimed elsewhere (corpus-wide min (doc_id, pos) per window
    * hash — exactly the claim the stream's state store hands out, so
    * a doc-id-ordered replay of this corpus through the stream emits
    * exactly these dup counts; SubstringDedupStreamSpec pins that).
    * Distinct from D12's symmetric c≥2 rule: the FIRST copy is clean
    * here — this is the intake-gate number ("how much of this NEW doc
    * was already admitted"), D12 is the audit number. One rank window
    * keyed on the hash + the D12 stats-branch join; no pairs held.
    */
  def streamSubstringDedup(spark: SparkSession, dir: String): DataFrame =
    streamSubstringDedupOf(Tables(spark, dir, "documents"))

  /** [[streamSubstringDedup]]'s kernel on caller documents frame. */
  def streamSubstringDedupOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val w = graft.dedup.Dedup.SubTokens
    val wins = docs
      .select(col("doc_id"),
        posexplode(graft.functions.GraftFunctions.rollingWinHashes(
          col("text"), w)).as(Seq("pos", "wh")))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("wh")).orderBy(col("doc_id"), col("pos"))
    val dups = wins
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") > 1)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_keepfirst"))
    docs
      .select(col("doc_id"),
        greatest(size(graft.text.TextOps.tokens(col("text")))
          .cast("long") - (w - 1), lit(0L)).as("n_windows"))
      .join(dups, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup_keepfirst"))
      .orderBy(col("doc_id"))
  }

  /** G17 `stream_semantic_dedup` — batch equivalent of
    * [[SemanticDedupStream]]'s embedding intake gate: every vector's
    * single-table random-hyperplane bucket (E2's kernel at tables=1),
    * then D9's SemDeDup dup rule against the first
    * [[SemanticDedupStream.RepCap]] bucket arrivals — dup iff any
    * lower-id rank-capped bucket-mate is ≥ τ on the 6-dp cosine, the
    * witness naming the earliest qualifying mate. A vec_id-ordered
    * replay of this corpus through the stream emits exactly these
    * dup rows (SemanticDedupStreamSpec pins it). Scale shape: the
    * pair join is bucket-equi with ONE side rank-capped, so each
    * vector scores against ≤ cap mates — Σ bucket·cap rows, never
    * bucket² — and the norm is hoisted to one projection per row.
    */
  def streamSemanticDedup(spark: SparkSession, dir: String): DataFrame =
    streamSemanticDedupOf(Tables(spark, dir, "embeddings"))

  /** [[streamSemanticDedup]]'s kernel on caller embeddings frame. */
  def streamSemanticDedupOf(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import graft.functions.GraftFunctions.{dotF, rhpSigs}
    import SemanticDedupStream.{Bits, RepCap, Tau}
    val c = emb
      .select(col("vec_id"), col("embedding"))
      .withColumn("bucket", element_at(rhpSigs(col("embedding"), Bits, 1), 1))
      .withColumn("nrm", sqrt(dotF(col("embedding"), col("embedding"))))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("vec_id"))
    val ranked = c.withColumn("rn", row_number().over(wr))
    val reps = ranked.filter(col("rn") <= RepCap)
      .select(col("bucket"), col("vec_id").as("ia"),
        col("embedding").as("ea"), col("nrm").as("na"))
    val dups = ranked
      .select(col("bucket"), col("vec_id").as("ib"),
        col("embedding").as("eb"), col("nrm").as("nb"))
      .join(reps, Seq("bucket"))
      .filter(col("ia") < col("ib"))
      .withColumn("cos",
        when(col("na") * col("nb") === 0.0, 0.0)
          .otherwise(dotF(col("ea"), col("eb")) / (col("na") * col("nb"))))
      .filter(round(col("cos"), 6) >= Tau)
      .groupBy(col("ib").as("vec_id"))
      .agg(min(col("ia")).as("kept"), max(round(col("cos"), 4)).as("mx"))
    ranked.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("bucket"),
        col("kept").isNotNull.cast("int").as("is_dup"),
        coalesce(col("kept"), lit(-1L)).as("dup_of"),
        coalesce(col("mx"), lit(0.0)).as("max_cos"))
      .orderBy(col("vec_id"))
  }

  /** G20 `stream_decontaminate` — batch arm of [[DecontaminateStream]]:
    * C44's fuzzy decontamination asked from the INTAKE side (one row
    * per arriving corpus doc: banded eval candidates, near-dups at
    * the signature bar, best estimated match) instead of C41/C44's
    * per-eval-item report. The kernel is D19's sidecar machinery
    * verbatim with the roles swapped — the eval slice
    * (doc_id % ContamMod = 0, C12's split) builds the two sidecars
    * and the REST of the corpus scores against them; the eval side is
    * tiny by nature, so both sidecars broadcast at any corpus size
    * and the per-batch cost is one corpus signature pass + a band
    * equi-join. The live twin flags each doc statelessly against the
    * same state ([[DecontaminateStream]]; spec pins stream ≡ batch
    * and micro-batch invariance).
    */
  def streamDecontaminate(spark: SparkSession, dir: String): DataFrame =
    streamDecontaminateOf(Tables(spark, dir, "documents"))

  /** [[streamDecontaminate]]'s kernel on caller documents frame. */
  def streamDecontaminateOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import graft.dedup.Dedup
    import graft.functions.GraftFunctions.minhashSig
    import graft.text.TextOps.ContamMod
    val sig = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .withColumn("toks", graft.text.TextOps.tokens(col("text")))
      .withColumn("shingles", graft.text.TextOps.wordShingles(col("toks")))
      .filter(size(col("shingles")) >= 1)
      .select(col("doc_id"),
        minhashSig(col("shingles"), Dedup.NumPerms).as("sig"))
      .localCheckpoint(true, MEMORY_AND_DISK_SER) // both sidecars + the intake pass read it
    val (bandSc, sigSc) = Dedup.minhashSidecars(
      sig.filter(pmod(col("doc_id"), lit(ContamMod)) === 0))
    Dedup.intakeMinhashDedup(
      sig.filter(pmod(col("doc_id"), lit(ContamMod)) =!= 0),
      bandSc, sigSc)
  }

  /** G19 `stream_heavy_hitters` — batch arm of [[HeavyHittersStream]]:
    * per-source exact θ-heavy tokens (θ = 1/HeavyDenom) via C11's
    * sketch-then-verify replayed PER GROUP — pass 1 collapses every
    * map partition to one ≤ MgCapacity-counter Misra-Gries summary
    * per source (mergeable partials → an O(sources × capacity) frame
    * reaches the driver, never the vocabulary), pass 2 exact-counts
    * only the sketches' candidates behind a broadcast membership
    * filter. MG theory makes each source's candidate set a superset
    * of its θ-heavy tokens, so the answer is EXACT while the
    * full-vocabulary exchange never happens — the same bounded-state
    * contract the stream maintains live in `GroupState`.
    */
  def streamHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    streamHeavyHittersOf(Tables(spark, dir, "documents"))

  /** [[streamHeavyHitters]]'s kernel on caller documents frame. */
  def streamHeavyHittersOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import graft.text.TextOps.{HeavyDenom, MgCapacity}
    val tokens = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("source"),
        explode(graft.text.TextOps.tokens(col("text"))).as("tok"))
    val sk = tokens.groupBy(col("source"))
      .agg(graft.functions.MisraGries.misraGries(col("tok"), MgCapacity)
        .as("sketch"),
        count(lit(1)).as("total"))
      .collect() // O(sources × capacity) — the bounded sketch frame
    // union of the per-source candidate sets: still a superset per
    // source (extra tokens are filtered by the exact threshold below)
    val cands = sk.flatMap(_.getMap[String, Long](1).keys).distinct.toSeq
    import spark.implicits._
    val totals = sk.map(r => (r.getString(0), r.getLong(2))).toSeq
      .toDF("source", "total")
    tokens.filter(col("tok").isInCollection(cands))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("n_occurrences"))
      .join(broadcast(totals), Seq("source"))
      .filter(col("n_occurrences") * HeavyDenom >= col("total"))
      .select(col("source"), col("tok"), col("n_occurrences"))
      .orderBy(col("source"), col("tok"))
  }

  /** G18 `stream_sequence_match` — batch equivalent of
    * [[SequenceMatchStream]]'s CEP detector: EVERY B96 pattern
    * instance (not just the per-user first — an intake gate acts per
    * occurrence), one row per matching purchase with its anchor
    * (view, click) pair and integer span. The instance frame is
    * B96's own pre-rank kernel
    * ([[graft.operators.EventOps.sequenceMatchInstances]]), so the
    * three arms — B96's summary, this batch frame, and the live
    * stream — share one definition; a (ts, event_id)-ordered replay
    * of this corpus through the stream emits exactly these rows
    * (SequenceMatchStreamSpec pins it under 1- and 3-batch splits).
    */
  def streamSequenceMatch(spark: SparkSession, dir: String): DataFrame =
    streamSequenceMatchOf(Tables(spark, dir, "events"))


  /** [[streamSequenceMatch]]'s kernel on any events-shaped frame. */
  def streamSequenceMatchOf(events: DataFrame): DataFrame =
    graft.operators.EventOps
      .sequenceMatchInstances(events)
      // event_id makes the sort total: two purchases of one user can
      // share purchase_ts (with distinct anchor pairs), and a tie
      // left engine-ordered would flip the cross-engine gate compare
      .orderBy(col("user_id"), col("purchase_ts"), col("event_id"))
      .drop("event_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_decontaminate" -> (streamDecontaminate _),
    "stream_heavy_hitters" -> (streamHeavyHitters _),
    "stream_sequence_match" -> (streamSequenceMatch _),
    "stream_semantic_dedup" -> (streamSemanticDedup _),
    "stream_substring_dedup" -> (streamSubstringDedup _),
    "stream_topk" -> (streamTopk _),
    "stream_window_counts" -> (windowCounts _),
    "stream_first_seen" -> (firstSeen _),
    "stream_dedup" -> (dedupStream _),
    "stream_join" -> (streamJoin _)
  )

  /** The [[SemanticDedupStream]] hyperplane weights as SQL literal
    * rows `(bit, DOUBLE[] weights)` — the E2 kernel's deterministic
    * ±1 draws from mix64(table=0, bit, dim) inlined verbatim, so the
    * oracle replays the EXACT signature (±1.0 products and in-order
    * double accumulation are IEEE-identical on both engines). Pinned
    * to the testdata's 64-dim embedding contract.
    */
  private def rhpWeightRows: String = {
    val dim = 64
    (0 until SemanticDedupStream.Bits).map { b =>
      val ws = (0 until dim).map { d =>
        if ((graft.functions.VecOps.mix64(
          (b.toLong << 20) ^ d) & 1L) == 0L) "1.0" else "-1.0"
      }.mkString("[", ", ", "]")
      s"($b, $ws::DOUBLE[])"
    }.mkString(",\n    ")
  }

  val oracle: Map[String, String] = Map(
    // G20 batch arm: D19's signature replay with the roles swapped —
    // corpus docs probe the eval slice's bands, candidates score by
    // signature match count (all integers, bit-exact replay)
    "stream_decontaminate" -> {
      import graft.dedup.Dedup.{IncMinhashMinMatches, NumPerms}
      import graft.text.TextOps.ContamMod
      s"""WITH ${graft.dedup.Dedup.minhashSigOracleCte},
        |${graft.dedup.Dedup.bandKeyOracleCte},
        |cand AS (SELECT DISTINCT c.doc_id AS doc_id, ev.doc_id AS sid
        |  FROM bk c JOIN bk ev ON c.band = ev.band AND c.bucket = ev.bucket
        |  WHERE c.doc_id % $ContamMod <> 0 AND ev.doc_id % $ContamMod = 0),
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
        |WHERE s.doc_id % $ContamMod <> 0 AND len(s.sh) >= 1
        |ORDER BY s.doc_id""".stripMargin
    },
    // G19 batch arm: exact per-source θ-heavy tokens — the answer the
    // sketch-then-verify pipeline computes without the full-vocabulary
    // exchange
    "stream_heavy_hitters" ->
      s"""WITH t AS (SELECT source,
         |    unnest(string_split_regex(trim(text), '\\s+')) AS tok
         |  FROM documents),
         |tot AS (SELECT source, count(*) AS total FROM t GROUP BY source),
         |c AS (SELECT source, tok, count(*) AS n_occurrences
         |  FROM t GROUP BY source, tok)
         |SELECT c.source, c.tok, c.n_occurrences
         |FROM c JOIN tot USING (source)
         |WHERE c.n_occurrences * ${graft.text.TextOps.HeavyDenom}
         |  >= tot.total
         |ORDER BY c.source, c.tok""".stripMargin,
    // G18 batch arm: B96's carry windows WITHOUT the final per-user
    // rank — every instance row survives
    "stream_sequence_match" ->
      s"""WITH o1 AS (SELECT user_id, ts, event_id, event_type,
         |    last_value(CASE WHEN event_type = 'view' THEN ts END
         |      IGNORE NULLS) OVER w AS lv,
         |    last_value(CASE WHEN event_type = 'error' THEN ts END
         |      IGNORE NULLS) OVER w AS le
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING)),
         |o2 AS (SELECT *,
         |    last_value(CASE WHEN event_type = 'click' AND lv IS NOT
         |      NULL THEN lv END IGNORE NULLS) OVER w2 AS pv,
         |    last_value(CASE WHEN event_type = 'click' AND lv IS NOT
         |      NULL THEN ts END IGNORE NULLS) OVER w2 AS pc
         |  FROM o1
         |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS UNBOUNDED PRECEDING))
         |SELECT user_id, pv AS view_ts, pc AS click_ts,
         |  ts AS purchase_ts,
         |  CAST(floor((epoch_us(ts) - epoch_us(pv)) / 1e6) AS BIGINT)
         |    AS span_sec
         |FROM o2
         |WHERE event_type = 'purchase' AND pc IS NOT NULL
         |  AND epoch_us(ts) - epoch_us(pv) <=
         |    ${graft.operators.EventOps.SeqMatchWindowUs}
         |  AND (le IS NULL OR le < pv)
         |ORDER BY user_id, purchase_ts, event_id""".stripMargin,
    // G17 batch arm: inline hyperplane-weight replay of the E2
    // signature (tables=1), rank-capped reps per bucket, D9's dup
    // rule on 6-dp cosines
    "stream_semantic_dedup" ->
      s"""WITH wts(b, w) AS (VALUES
         |    $rhpWeightRows),
         |sigs AS (SELECT e.vec_id, CAST(sum(CASE
         |      WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
         |        t.w) > 0 THEN 1 << t.b ELSE 0 END) AS BIGINT) AS bucket
         |  FROM embeddings e CROSS JOIN wts t GROUP BY e.vec_id),
         |g AS (SELECT s.vec_id, s.bucket, e.embedding,
         |    row_number() OVER (PARTITION BY s.bucket
         |      ORDER BY s.vec_id) AS rn
         |  FROM sigs s JOIN embeddings e USING (vec_id)),
         |prs AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
         |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
         |      CAST(b.embedding AS DOUBLE[])), 6) AS c6,
         |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
         |      CAST(b.embedding AS DOUBLE[])), 4) AS c4
         |  FROM g a JOIN g b ON a.bucket = b.bucket
         |    AND a.vec_id < b.vec_id
         |  WHERE a.rn <= ${SemanticDedupStream.RepCap}),
         |dups AS (SELECT ib AS vec_id, min(ia) AS kept, max(c4) AS mx
         |  FROM prs WHERE c6 >= ${SemanticDedupStream.Tau} GROUP BY ib)
         |SELECT g.vec_id, g.bucket,
         |  CAST(d.kept IS NOT NULL AS INT) AS is_dup,
         |  coalesce(d.kept, -1) AS dup_of,
         |  coalesce(d.mx, 0.0) AS max_cos
         |FROM g LEFT JOIN dups d USING (vec_id)
         |ORDER BY g.vec_id""".stripMargin,
    // G15 batch arm: literal-window-string groups (D12's collision
    // certification), keep-first = rank 1 per group in (doc_id, pos)
    // order, per-doc count of the non-first occurrences
    "stream_substring_dedup" ->
      """WITH t AS (SELECT doc_id,
        |    string_split_regex(trim(text), '\s+') AS w
        |  FROM documents),
        |w0 AS (SELECT doc_id, w,
        |    unnest(range(1, len(w) - 14)) AS i
        |  FROM t WHERE len(w) >= 16),
        |wins AS (SELECT doc_id, i - 1 AS pos,
        |    array_to_string(w[i : i + 15], ' ') AS win
        |  FROM w0),
        |r AS (SELECT doc_id,
        |    row_number() OVER (PARTITION BY win
        |      ORDER BY doc_id, pos) AS rn
        |  FROM wins),
        |agg AS (SELECT doc_id, count(*) AS n_dup
        |  FROM r WHERE rn > 1 GROUP BY doc_id),
        |base AS (SELECT doc_id,
        |    greatest(len(w) - 15, 0) AS n_windows
        |  FROM t)
        |SELECT b.doc_id, b.n_windows,
        |  CAST(coalesce(a.n_dup, 0) AS BIGINT) AS n_dup_keepfirst
        |FROM base b LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "stream_topk" ->
      """WITH wc AS (
        |  SELECT date_trunc('hour', ts) AS window_start, event_type,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT window_start, event_type, n_events, rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY window_start
        |    ORDER BY n_events DESC, event_type) AS rk
        |  FROM wc) r
        |WHERE rk <= 3 ORDER BY window_start, rk""".stripMargin,
    "stream_window_counts" ->
      """SELECT date_trunc('hour', ts) AS window_start,
        |  date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
        |  event_type, count(*) AS n_events,
        |  sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0
        |    AS sum_value
        |FROM events GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin,
    "stream_first_seen" ->
      """WITH f AS (SELECT user_id, min(ts) AS first_ts
        |  FROM events GROUP BY user_id)
        |SELECT CAST(first_ts AS DATE) AS first_day,
        |  count(*) AS n_new_keys
        |FROM f GROUP BY 1 ORDER BY first_day""".stripMargin,
    "stream_dedup" ->
      """SELECT event_id, min(ts) AS first_ts, count(*) AS n_seen
        |FROM events GROUP BY event_id ORDER BY event_id""".stripMargin,
    "stream_join" ->
      """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
        |  v.ts AS v_ts, c.ts AS c_ts
        |FROM events v JOIN events c
        |  ON v.user_id = c.user_id
        |  AND c.ts >= v.ts AND c.ts < v.ts + INTERVAL 30 MINUTE
        |WHERE v.event_type = 'view' AND c.event_type = 'click'
        |ORDER BY v.user_id, view_id, click_id""".stripMargin
  )
}
