package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** ETL-core operators (SURVEY.md §2.A) — the reference pipeline's
  * capability surface (`aiesec.py`) re-expressed as general distributed
  * operators: field extraction, normalization, snapshot deltas, upserts,
  * derived flags, report rendering, delta alerts.
  *
  * All plans are declarative `functions._` chains (codegen'd, no UDFs);
  * snapshot diffs are anti/full-outer joins keyed on the entity key, so
  * they shuffle once on a high-cardinality key and scale linearly.
  */
object Etl {

  /** A1 `etl_extract` — regex field extraction from semi-structured text
    * (≈ per-card scraping, aiesec.py:70-125): first word, first integer,
    * digit presence. Pure regexp_extract, stays in whole-stage codegen.
    */
  def extract(spark: SparkSession, dir: String): DataFrame =
    extractOf(Tables(spark, dir, "documents"))


  /** [[extract]]'s kernel on any documents-shaped frame. */
  def extractOf(docs: DataFrame): DataFrame =
    docs
      .select(
        col("doc_id"),
        regexp_extract(col("text"), "^([A-Za-z]+)", 1).as("first_word"),
        nullif(regexp_extract(col("text"), "([0-9]+)", 1), lit(""))
          .cast("long").as("first_int"),
        col("text").rlike("[0-9]").cast("int").as("has_digit"))
      .orderBy(col("doc_id"))

  /** A2 `etl_normalize` — trim/case normalization + stable integer cast
    * (≈ aiesec.py:105,139 type cleanup). Rounds before casting so the
    * double→int behavior is engine-independent.
    */
  def normalize(spark: SparkSession, dir: String): DataFrame =
    normalizeOf(Tables(spark, dir, "customer"))


  /** [[normalize]]'s kernel on any customer-shaped frame. */
  def normalizeOf(cust: DataFrame): DataFrame =
    cust
      .select(
        col("c_custkey"),
        upper(trim(col("c_name"))).as("name_norm"),
        lower(col("c_mktsegment")).as("segment_norm"),
        round(col("c_acctbal") * 100, 0).cast("long").as("acctbal_cents"),
        when(col("c_acctbal") < 0, "N/A")
          .otherwise(format_string("%.2f", col("c_acctbal")))
          .as("acctbal_display"))
      .orderBy(col("c_custkey"))

  /** Yesterday's order snapshot: the deterministic data-derived split
    * standing in for the reference's rotated Yesterday.xlsx (SURVEY §3).
    */
  private def ordersYesterday(orders: DataFrame): DataFrame =
    orders
      .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))

  /** A3 `etl_snapshot_new` — keys in today absent from yesterday
    * (LEFT ANTI ≈ `~isin`, aiesec.py:142-144). One shuffle on the key;
    * at scale the anti join is the standard incremental-ingest delta.
    */
  def snapshotNew(spark: SparkSession, dir: String): DataFrame =
    snapshotNewOf(Tables(spark, dir, "orders"))

  /** [[snapshotNew]]'s kernel on any orders-shaped frame. */
  def snapshotNewOf(today: DataFrame): DataFrame = {
    today.join(ordersYesterday(today).select(col("o_orderkey").as("y_key")),
        today("o_orderkey") === col("y_key"), "left_anti")
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_orderkey"))
  }

  /** A4 `etl_snapshot_changed` — full-outer snapshot compare on per-user
    * event aggregates at two time cutoffs → added / changed / unchanged.
    * Generalizes the reference's today-vs-yesterday diff beyond pure
    * key-presence to value drift.
    */
  def snapshotChanged(spark: SparkSession, dir: String): DataFrame =
    snapshotChangedOf(Tables(spark, dir, "events"))


  /** [[snapshotChanged]]'s kernel on any events-shaped frame. */
  def snapshotChangedOf(events: DataFrame): DataFrame = {
    val ev = events
    def snap(cutoff: Option[String]) = cutoff.fold(ev)(c =>
        ev.filter(col("ts") < lit(c).cast("timestamp")))
      .groupBy(col("user_id"))
      .agg(round(sum(col("value")), 2).as("total"), count(lit(1)).as("n"))
    val y = snap(Some("2024-01-15")).select(col("user_id").as("u"),
      col("total").as("old_total"), col("n").as("old_n"))
    val t = snap(None)
    t.join(y, t("user_id") === col("u"), "full_outer")
      .select(
        coalesce(col("user_id"), col("u")).as("user_id"),
        col("old_total"), col("old_n"),
        col("total").as("new_total"), col("n").as("new_n"),
        when(col("u").isNull, "added")
          .when(col("user_id").isNull, "removed")
          .when(col("total") === col("old_total") && col("n") === col("old_n"),
            "unchanged")
          .otherwise("changed").as("status"))
      .orderBy(col("user_id"))
  }

  /** A5 `etl_upsert_latest` — last-write-wins upsert per key by event
    * time (event_id tiebreak). Single shuffle on user_id + in-partition
    * sort: the scalable dedup-window shape for CDC-style ingest.
    */
  def upsertLatest(spark: SparkSession, dir: String): DataFrame =
    upsertLatestOf(Tables(spark, dir, "events"))


  /** [[upsertLatest]]'s kernel on any events-shaped frame. */
  def upsertLatestOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("ts").as("last_ts"), col("event_type").as("last_type"),
        round(col("value"), 2).as("last_value"))
      .orderBy(col("user_id"))
  }

  /** A6 `etl_derived_flags` — conditional flags + rank parsing from text
    * (≈ premium flag substring test + applicants count, aiesec.py:70-125):
    * urgency flag, numeric rank parsed out of the priority string, value
    * banding.
    */
  def derivedFlags(spark: SparkSession, dir: String): DataFrame =
    derivedFlagsOf(Tables(spark, dir, "orders"))


  /** [[derivedFlags]]'s kernel on any orders-shaped frame. */
  def derivedFlagsOf(orders: DataFrame): DataFrame =
    orders
      .select(
        col("o_orderkey"),
        col("o_orderpriority"),
        regexp_extract(col("o_orderpriority"), "^([0-9])", 1)
          .cast("int").as("priority_rank"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH")
          .cast("int").as("is_urgent"),
        when(col("o_totalprice") >= 200000, "high")
          .when(col("o_totalprice") >= 50000, "mid")
          .otherwise("low").as("value_band"))
      .orderBy(col("o_orderkey"))

  /** A7 `etl_report_cards` — deterministic HTML card per row
    * (≈ aiesec.py:191-218) over an already-aggregated top-N frame, so
    * rendering cost is O(report size), not O(data).
    */
  def reportCards(spark: SparkSession, dir: String): DataFrame =
    reportCardsOf(Tables(spark, dir, "customer"))


  /** [[reportCards]]'s kernel on any customer-shaped frame. */
  def reportCardsOf(cust: DataFrame): DataFrame =
    cust
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(10)
      .select(col("c_custkey"),
        concat(
          lit("<div class=\"card\"><h2>"), col("c_name"),
          lit("</h2><p>segment: "), col("c_mktsegment"),
          lit("</p><p>balance: "), format_string("%.2f", col("c_acctbal")),
          lit("</p></div>")).as("card_html"))
      .orderBy(col("c_custkey"))

  /** A8 `etl_alert_delta` — conditional alert payload: the delta's
    * summary row, message only when non-empty (≈ aiesec.py:241-251).
    */
  def alertDelta(spark: SparkSession, dir: String): DataFrame =
    alertDeltaOf(Tables(spark, dir, "orders"))

  /** [[alertDelta]]'s kernel on any orders-shaped frame. */
  def alertDeltaOf(orders: DataFrame): DataFrame =
    snapshotNewOf(orders)
      .agg(count(lit(1)).as("n_new"),
        round(sum(col("o_totalprice")), 2).as("new_value"))
      .select(col("n_new"), col("new_value"),
        when(col("n_new") > 0,
          concat(lit("ALERT: "), col("n_new").cast("string"),
            lit(" new records")))
          .otherwise("no-op").as("message"))

  /** A15 `sample_split` — deterministic train/val/test split by content-
    * independent key hash: first md5 byte of the stringified doc_id
    * buckets each doc into train (75%) / val (12.5%) / test (12.5%).
    * Hash-based splits are reproducible across engines and runs, stable
    * under repartitioning, and need no shuffle to assign — the only
    * exchange here is the 3-group summary rollup.
    */
  def sampleSplit(spark: SparkSession, dir: String): DataFrame =
    sampleSplitOf(Tables(spark, dir, "documents"))


  /** [[sampleSplit]]'s kernel on any documents-shaped frame. */
  def sampleSplitOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("hx",
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2))
      .withColumn("split",
        when(col("hx") < "c0", "train")
          .when(col("hx") < "e0", "val")
          .otherwise("test"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"),
        round(avg(col("n_chars")), 4).as("avg_chars"))
      .orderBy(col("split"))

  /** A35 `etl_merge_cdc` — MERGE INTO semantics from a change-log (the
    * Delta/Iceberg upsert-with-deletes shape, as a pure computation):
    * events act as CDC records per key ('error' → DELETE, anything
    * else → UPSERT of the latest value), the last op per key wins
    * (event-time order, event_id tiebreak), and the merge against the
    * base snapshot classifies every surviving row as kept / updated /
    * inserted — deletes drop out. One window over the change-log keyed
    * on the merge key + one full-outer join against the base: the
    * exact shuffle plan a table-format MERGE executes, with the
    * decision matrix spelled out instead of hidden in a writer.
    */
  def etlMergeCdc(spark: SparkSession, dir: String): DataFrame =
    etlMergeCdcOf(Tables(spark, dir, "events"), Tables(spark, dir, "customer"))

  /** [[etlMergeCdc]]'s kernel on caller events/customer frames. */
  def etlMergeCdcOf(events: DataFrame, cust: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val lastOp = events
      .withColumn("op",
        when(col("event_type") === "error", "D").otherwise("U"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id").as("key"), col("op"),
        round(col("value"), 2).as("new_value"))
    val base = cust
      .select(col("c_custkey").cast("long").as("key"),
        round(col("c_acctbal"), 2).as("base_value"))
    base.join(lastOp, Seq("key"), "full_outer")
      .withColumn("status",
        when(col("op").isNull, "kept")
          .when(col("op") === "D", "deleted")
          .when(col("base_value").isNull, "inserted")
          .otherwise("updated"))
      .filter(col("status") =!= "deleted")
      .select(col("key"),
        coalesce(col("new_value"), col("base_value")).as("value"),
        col("status"))
      .orderBy(col("key"))
  }

  /** A27 `sample_weighted` — weighted k-sampling without replacement
    * (Efraimidis–Spirakis A-Res): each doc draws a deterministic
    * uniform u from its md5 (6 hex digits, +0.5 to stay inside (0,1)),
    * gets key u^(1/w) with w = its length weight, and the global top-k
    * keys win — longer docs proportionally likelier, no RNG state,
    * identical sample on any engine/run/partitioning. The rank runs on
    * the 10-dp-rounded key with doc_id tiebreak (engine-jitter guard),
    * and TakeOrderedAndProject keeps it a map-side heap, not a global
    * sort.
    */
  def sampleWeighted(spark: SparkSession, dir: String): DataFrame =
    sampleWeightedOf(Tables(spark, dir, "documents"))


  /** [[sampleWeighted]]'s kernel on any documents-shaped frame. */
  def sampleWeightedOf(docs: DataFrame): DataFrame = {
    val k = 50
    docs
      .withColumn("u",
        (conv(substring(md5(col("doc_id").cast("string").cast("binary")),
          1, 6), 16, 10).cast("double") + 0.5) / (1 << 24).toDouble)
      .withColumn("key", round(
        pow(col("u"), lit(1.0) / col("n_chars").cast("double")), 10))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("n_chars").as("weight"), col("key"))
      .orderBy(col("doc_id"))
  }

  /** A17 `sample_stratified` — per-stratum deterministic downsampling:
    * each language keeps a different fraction, selected by comparing
    * the doc's md5 bucket to a per-stratum hex threshold ('80' = 50%,
    * '40' = 25%). Hash-threshold sampling is exactly reproducible
    * across runs/engines, needs no sort or count-first pass, and a
    * stratum's rate can be retuned without touching other strata — the
    * standard corpus-mixing knob (upsample rare languages, downsample
    * dominant ones). Map-only select + one tiny rollup shuffle.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame =
    sampleStratifiedOf(Tables(spark, dir, "documents"))


  /** [[sampleStratified]]'s kernel on any documents-shaped frame. */
  def sampleStratifiedOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("hx",
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2))
      .withColumn("keep",
        (col("hx") < when(col("lang") === "en", "80").otherwise("40"))
          .cast("long"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(col("keep")).as("n_sampled"),
        round(sum(col("keep")) / count(lit(1)), 4).as("sample_rate"))
      .orderBy(col("lang"))

  /** A18 `etl_incremental_agg` — incremental aggregate maintenance:
    * yesterday's per-(type, day) aggregate snapshot is MERGED with the
    * new slice's partial aggregates instead of recomputing history —
    * counts and sums are associative, so merge = union + re-sum on the
    * group key. The two inputs stand in for a persisted snapshot table
    * and today's arrivals (split at a fixed cutoff); the oracle is the
    * full recompute, proving merge ≡ recompute. At 100 TB this is the
    * difference between touching one day and touching the archive.
    */
  def incrementalAgg(spark: SparkSession, dir: String): DataFrame =
    incrementalAggOf(Tables(spark, dir, "events"))


  /** [[incrementalAgg]]'s kernel on any events-shaped frame. */
  def incrementalAggOf(events: DataFrame): DataFrame = {
    val cutoff = lit("2024-01-20").cast("timestamp")
    def slice(cond: Column): DataFrame =
      events
        .filter(cond)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
    val snapshot = slice(col("ts") < cutoff)  // persisted history
    val fresh = slice(col("ts") >= cutoff)    // today's arrivals
    snapshot.unionByName(fresh)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n")).as("n_events"),
        round(sum(col("v")), 2).as("sum_value"))
      .orderBy(col("event_type"), col("day"))
  }

  val ShufShards = 16

  /** A20 `corpus_shuffle` — deterministic global training-order
    * shuffle: every doc gets a pseudorandom (shard, pos) from the md5
    * of its id, reproducible bit-for-bit across runs and engines (no
    * RNG state, no seed file). Shard assignment is the first hex
    * nibble (map-only); within-shard order is the hash string, so the
    * only shuffle is the per-shard window — at 100 TB, shards are the
    * write-task granularity and each sorts locally; pair with
    * ShardedWriter for the physical layout.
    */
  def corpusShuffle(spark: SparkSession, dir: String): DataFrame =
    corpusShuffleOf(Tables(spark, dir, "documents"))


  /** [[corpusShuffle]]'s kernel on any documents-shaped frame. */
  def corpusShuffleOf(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("h"), col("doc_id"))
    docs
      .withColumn("h", md5(col("doc_id").cast("string").cast("binary")))
      .withColumn("shard",
        (expr("instr('0123456789abcdef', substring(h, 1, 1))") - 1)
          .cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  /** A25 `etl_dq_checks` — the data-quality gate a pipeline runs before
    * trusting a batch: PK uniqueness, FK orphan counts, domain and
    * temporal-order violations, each as one (check, n_checked,
    * n_violations) row. Every check reduces to a count BEFORE the union
    * — the whole audit ships a handful of scalar rows no matter the
    * input size — and each FK check is an anti join keyed on the FK
    * (the PK side broadcasts when dim-sized). A real deployment runs
    * this ON the day's delta, not the archive.
    */
  def dqChecks(spark: SparkSession, dir: String): DataFrame =
    dqChecksOf(Tables(spark, dir, "orders"), Tables(spark, dir, "lineitem"), Tables(spark, dir, "customer"))

  /** [[dqChecks]]'s kernel on caller orders/lineitem/customer frames. */
  def dqChecksOf(orders: DataFrame, li: DataFrame, cust: DataFrame): DataFrame = {
    // one multi-aggregate pass per table (N checks ≠ N scans), plus one
    // pass per relationship — 4 scans of the two fact tables total
    // instead of one per (check × operand)
    val oStats = orders.agg(
      count(lit(1)).as("o_n"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("pk_dups"),
      sum(when(col("o_totalprice") < 0, 1L).otherwise(0L)).as("neg_price"))
    val lStats = li.agg(
      count(lit(1)).as("l_n"),
      sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("bad_qty"))
    val custOrphans = orders
      .join(cust.select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("cust_orphans"))
    val liJoined = li.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
          .as("li_orphans"),
        sum(when(col("l_shipdate") < col("o_orderdate"), 1L).otherwise(0L))
          .as("ship_before"))
    val flat = oStats.crossJoin(lStats).crossJoin(custOrphans)
      .crossJoin(liJoined)
    flat.select(expr(
      """stack(6,
        |  'orders_pk_unique', o_n, pk_dups,
        |  'orders_custkey_fk', o_n, cust_orphans,
        |  'orders_price_nonneg', o_n, neg_price,
        |  'lineitem_orderkey_fk', l_n, li_orphans,
        |  'lineitem_qty_positive', l_n, bad_qty,
        |  'lineitem_ship_after_order', l_n, ship_before)
        |  AS (check_name, n_checked, n_violations)""".stripMargin))
      .orderBy(col("check_name"))
  }

  /** A32 `etl_profile` — per-column data profiling (the discovery pass
    * every migration/DQ effort starts with): row count, null count,
    * distinct count, min/max per column, long-form one row per column.
    * ONE pass over the table computes every aggregate (no per-column
    * rescans — the naive UNION-ALL spelling the oracle uses scans once
    * per column); the stack() unpivot is map-side. Profiled values are
    * exact integers/strings — numeric min/max stringified AFTER the
    * aggregate so ordering stays numeric but output stays cross-engine
    * formatting-safe.
    */
  def etlProfile(spark: SparkSession, dir: String): DataFrame =
    etlProfileOf(Tables(spark, dir, "customer"))


  /** [[etlProfile]]'s kernel on any customer-shaped frame. */
  def etlProfileOf(cust: DataFrame): DataFrame = {
    val c = cust
    def nulls(col0: String) =
      sum(when(col(col0).isNull, 1L).otherwise(0L)).as(s"${col0}_nulls")
    c.agg(
        count(lit(1)).as("n"),
        nulls("c_custkey"), countDistinct(col("c_custkey")).as("c_custkey_d"),
        min(col("c_custkey")).cast("string").as("c_custkey_min"),
        max(col("c_custkey")).cast("string").as("c_custkey_max"),
        nulls("c_name"), countDistinct(col("c_name")).as("c_name_d"),
        min(col("c_name")).as("c_name_min"),
        max(col("c_name")).as("c_name_max"),
        nulls("c_mktsegment"),
        countDistinct(col("c_mktsegment")).as("c_mktsegment_d"),
        min(col("c_mktsegment")).as("c_mktsegment_min"),
        max(col("c_mktsegment")).as("c_mktsegment_max"),
        nulls("c_nationkey"),
        countDistinct(col("c_nationkey")).as("c_nationkey_d"),
        min(col("c_nationkey")).cast("string").as("c_nationkey_min"),
        max(col("c_nationkey")).cast("string").as("c_nationkey_max"))
      .select(expr(
        """stack(4,
          |  'c_custkey', n, c_custkey_nulls, c_custkey_d,
          |    c_custkey_min, c_custkey_max,
          |  'c_mktsegment', n, c_mktsegment_nulls, c_mktsegment_d,
          |    c_mktsegment_min, c_mktsegment_max,
          |  'c_name', n, c_name_nulls, c_name_d, c_name_min, c_name_max,
          |  'c_nationkey', n, c_nationkey_nulls, c_nationkey_d,
          |    c_nationkey_min, c_nationkey_max)
          |  AS (col_name, n_rows, n_nulls, n_distinct, min_val, max_val)"""
          .stripMargin))
      .orderBy(col("col_name"))
  }

  /** PSI band edges (industry-conventional): < 0.1 stable, < 0.25
    * moderate shift, else shifted. Compared on the round(·, 6) score so
    * the verdict can only flip where the score itself already differs.
    */
  private val PsiModerate = 0.1
  private val PsiShifted = 0.25

  val FreshnessSlaUs = 86400000000L // 24 h in µs — the daily-feed SLA

  /** A34 `etl_freshness` — per-feed staleness audit: the first
    * operational check on a scheduled pipeline ("did every feed land
    * today?" — the reference's whole reason to exist is a daily pull,
    * and a silently stalled feed is its worst failure mode). Per
    * event type: volume, last-seen timestamp, lag behind the NEWEST
    * event anywhere (the corpus max is the deterministic "now" — wall
    * clock would make the result unreproducible), and a stale flag at
    * the 24 h SLA. All integer-µs arithmetic; one map-side-combined
    * aggregation to the O(types) frame + a one-row broadcast max.
    */
  def etlFreshness(spark: SparkSession, dir: String): DataFrame =
    etlFreshnessOf(Tables(spark, dir, "events"))


  /** [[etlFreshness]]'s kernel on any events-shaped frame. */
  def etlFreshnessOf(events: DataFrame): DataFrame =
    freshness(events)

  /** [[etlFreshness]]'s core on any (event_type, ts) frame. */
  def freshness(events: DataFrame): DataFrame = {
    val e = events
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
    val glob = e.agg(max(col("us")).as("gmax"))
    e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), max(col("us")).as("last_us"))
      .crossJoin(broadcast(glob))
      .select(col("event_type"), col("n_events"),
        timestamp_micros(col("last_us")).as("last_seen"),
        (col("gmax") - col("last_us")).as("lag_us"),
        ((col("gmax") - col("last_us")) > FreshnessSlaUs)
          .cast("int").as("stale"))
      .orderBy(col("event_type"))
  }

  /** A32 `etl_drift_psi` — distribution-drift audit between two time
    * slices (Population Stability Index, the standard model-monitoring
    * drift score): the event span splits at its exact integer-microsecond
    * midpoint (one broadcast min/max row) into a baseline and a current
    * half, values land in fixed-width bins (`floor(value / 5)` capped at
    * 9 — halving and floor on doubles are bit-exact cross-engine, no
    * cents dance needed), and per type
    * PSI = Σ_bins (p − q) · ln(p / q) over Laplace-smoothed shares
    * ((n+1)/(N+bins) — integer-count rationals, so empty bins stay
    * defined without an epsilon fudge). One fact-scale shuffle down to
    * the O(types × bins) frame; the window totals, shares, and the ln
    * all run on that ~50-row frame. ln is double math, guarded by
    * round(·, 6) like every cross-engine float comparison here.
    */
  def etlDriftPsi(spark: SparkSession, dir: String): DataFrame =
    etlDriftPsiOf(Tables(spark, dir, "events"))


  /** [[etlDriftPsi]]'s kernel on any events-shaped frame. */
  def etlDriftPsiOf(events: DataFrame): DataFrame =
    driftPsi(events)

  /** [[etlDriftPsi]]'s core on any (event_type, ts, value) frame. */
  def driftPsi(events: DataFrame): DataFrame = {
    val e = events.select(col("event_type"),
      unix_micros(col("ts")).as("us"),
      least(floor(col("value") / 5).cast("int"), lit(9)).as("bin"))
    val span = e.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
    val counts = e.crossJoin(broadcast(span))
      .withColumn("is_base",
        when(col("us") < expr("lo + (hi - lo) div 2"), 1L).otherwise(0L))
      .groupBy(col("event_type"), col("bin"))
      .agg(sum(col("is_base")).as("nb"),
        sum(lit(1L) - col("is_base")).as("nc"))
    val spine = e.select(col("event_type")).distinct()
      .crossJoin(events.sparkSession.range(0, 10)
        .select(col("id").cast("int").as("bin")))
    val wt = Window.partitionBy(col("event_type"))
    spine.join(counts, Seq("event_type", "bin"), "left")
      .na.fill(0L, Seq("nb", "nc"))
      .withColumn("tb", sum(col("nb")).over(wt))
      .withColumn("tc", sum(col("nc")).over(wt))
      .withColumn("p", (col("nb") + lit(1.0)) / (col("tb") + lit(10.0)))
      .withColumn("q", (col("nc") + lit(1.0)) / (col("tc") + lit(10.0)))
      .groupBy(col("event_type"))
      .agg(max(col("tb")).as("n_base"), max(col("tc")).as("n_cur"),
        round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6)
          .as("psi"))
      .withColumn("band",
        when(col("psi") < PsiModerate, "stable")
          .when(col("psi") < PsiShifted, "moderate")
          .otherwise("shifted"))
      .orderBy(col("event_type"))
  }

  val ErasureThresh = 1024L // md5-u16 keep bound ≈ 1.56% of users

  /** A41 `etl_erasure_plan` — right-to-erasure rewrite planning (the
    * GDPR Article 17 batch problem: parquet files are immutable, so
    * deleting a user means REWRITING every partition that contains
    * them — the question an operator must answer before launching the
    * job is "how much am I rewriting per row actually deleted"): for
    * a deletion cohort (users whose seeded md5-u16 draw falls under
    * [[ErasureThresh]] — the house no-RNG contract standing in for a
    * real request list; production swaps one line for a DSAR table
    * join), per day-partition the total rows, rows to delete,
    * distinct users erased, and the write-amplification in floor
    * basis points (partition_rows·10⁴ / deleted_rows — the rewrite
    * cost multiplier; null for untouched partitions, which need no
    * rewrite at all). ONE map-side-combined fact shuffle to the
    * O(days) frame; at 100 TB this is the planning scan that decides
    * between per-partition rewrite and a deletion-vector layout.
    */
  def etlErasurePlan(spark: SparkSession, dir: String): DataFrame =
    etlErasurePlanOf(Tables(spark, dir, "events"))


  /** [[etlErasurePlan]]'s kernel on any events-shaped frame. */
  def etlErasurePlanOf(events: DataFrame): DataFrame =
    erasurePlan(events)

  /** [[etlErasurePlan]]'s kernel on any events frame. */
  private[etl] def erasurePlan(events: DataFrame): DataFrame =
    events
      .withColumn("del",
        conv(substring(md5(col("user_id").cast("string").cast("binary")),
          1, 4), 16, 10).cast("long") < ErasureThresh)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("part_rows"),
        sum(when(col("del"), 1L).otherwise(0L)).as("del_rows"),
        countDistinct(when(col("del"), col("user_id"))).as("del_users"))
      .withColumn("amp_bp",
        expr("case when del_rows > 0 then part_rows * 10000 div del_rows end"))
      .orderBy(col("day"))

  /** Candidate TTL windows for `etl_retention_plan`, in days. */
  val RetentionDays: Seq[Int] = Seq(7, 30, 60, 90)

  /** A48 `etl_retention_plan` — age-based TTL policy planning, the
    * retention companion to A41 (erasure deletes PEOPLE; retention
    * deletes AGE — the "keep 30/60/90 days" decision every
    * data-retention policy codifies, and the one a compliance review
    * asks to see quantified before signing off): for each candidate
    * window in [[RetentionDays]], the rows a cutoff at `max(ts) −
    * ttl` would delete, the rows kept, the exact basis-point delete
    * share, and the distinct users who lose at least one event (the
    * user-impact axis row counts hide — a 90-day TTL deleting 5% of
    * rows but touching 80% of users is a different conversation).
    * "Now" is the span maximum (one broadcast min/max-style row, the
    * A32 trick) so the report is deterministic on a fixed table.
    * Scale shape: ONE pass computes event ages; two map-side-combined
    * collapses — O(days) per-age row counts and O(users) oldest-event
    * ages — then the 4-row grid joins the day frame (tiny non-equi)
    * and sweeps the user frame once (broadcast grid, groupBy combine).
    * No per-TTL rescan of the fact table.
    */
  def etlRetentionPlan(spark: SparkSession, dir: String): DataFrame =
    etlRetentionPlanOf(Tables(spark, dir, "events"))


  /** [[etlRetentionPlan]]'s kernel on any events-shaped frame. */
  def etlRetentionPlanOf(events: DataFrame): DataFrame =
    retentionPlan(events)

  /** [[etlRetentionPlan]]'s kernel on any events frame. */
  private[etl] def retentionPlan(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val span = events.agg(max(unix_micros(col("ts"))).as("hi"))
    val aged = events
      .select(unix_micros(col("ts")).as("us"), col("user_id"))
      .crossJoin(broadcast(span))
      .withColumn("age_d", expr("(hi - us) div 86400000000"))
    val days = aged.groupBy(col("age_d")).agg(count(lit(1)).as("n_rows"))
    val umax = aged.groupBy(col("user_id"))
      .agg(max(col("age_d")).as("max_age"))
    val grid = RetentionDays.toDF("ttl_days")
    val del = grid
      .join(days, col("age_d") >= col("ttl_days"), "left")
      .groupBy(col("ttl_days"))
      .agg(coalesce(sum(col("n_rows")), lit(0L)).as("n_rows_deleted"))
    val ua = umax.crossJoin(broadcast(grid))
      .filter(col("max_age") >= col("ttl_days"))
      .groupBy(col("ttl_days"))
      .agg(count(lit(1)).as("n_users_affected"))
    grid
      .join(del, Seq("ttl_days"))
      .join(ua, Seq("ttl_days"), "left")
      .na.fill(0L, Seq("n_users_affected"))
      .crossJoin(broadcast(
        days.agg(sum(col("n_rows")).as("n_total"))))
      .withColumn("n_rows_kept", col("n_total") - col("n_rows_deleted"))
      .withColumn("deleted_bp",
        expr("n_rows_deleted * 10000 div n_total"))
      .select(col("ttl_days"), col("n_total"), col("n_rows_deleted"),
        col("n_rows_kept"), col("deleted_bp"), col("n_users_affected"))
      .orderBy(col("ttl_days"))
  }

  // md5-u16 selection bound ≈ 12.5% of users — wide enough that the
  // cohort is non-empty even at the 15-user sf0.001 table
  val SubjectThresh = 8192L

  /** A44 `etl_subject_export` — data-subject access export (the
    * GDPR Art. 15 companion to A41's Art. 17 erasure planning: before
    * deleting a person you must be able to HAND them their data): for
    * each selected user, the complete per-system inventory — event
    * count, activity span, monetary total in integer cents, per-type
    * counts, and the md5 fingerprint of the exact ordered event-id
    * set, which is the export's identity (the same pin
    * emb_cluster_sample uses): two export runs that fingerprint equal
    * handed over the same rows. Selection is the deterministic
    * salted-md5 u16 draw (the house no-RNG contract), standing in for
    * the request queue. One user-keyed shuffle; the export frame is
    * O(selected users) and every reported number is integer-exact.
    */
  def etlSubjectExport(spark: SparkSession, dir: String): DataFrame =
    etlSubjectExportOf(Tables(spark, dir, "events"))


  /** [[etlSubjectExport]]'s kernel on any events-shaped frame. */
  def etlSubjectExportOf(events: DataFrame): DataFrame =
    subjectExport(events)

  /** [[etlSubjectExport]]'s kernel on any events frame. */
  private[etl] def subjectExport(events: DataFrame): DataFrame = {
    val typeCounts = Seq("click", "error", "purchase", "signup", "view")
      .map(t => sum(when(col("event_type") === t, 1L).otherwise(0L))
        .as(s"n_$t"))
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      min(col("ts")).as("first_ts"),
      max(col("ts")).as("last_ts"),
      sum(expr("cast(round(value * 100) as bigint)")).as("value_cents")) ++
      typeCounts :+
      md5(array_join(transform(sort_array(collect_list(col("event_id"))),
        _.cast("string")), ",").cast("binary")).as("events_fp")
    events
      .filter(conv(substring(md5(concat(lit("sx:"),
          col("user_id").cast("string")).cast("binary")), 1, 4), 16, 10)
        .cast("long") < SubjectThresh)
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_subject_export" -> (etlSubjectExport _),
    "etl_erasure_plan" -> (etlErasurePlan _),
    "etl_retention_plan" -> (etlRetentionPlan _),
    "etl_drift_psi" -> (etlDriftPsi _),
    "etl_freshness" -> (etlFreshness _),
    "etl_profile" -> (etlProfile _),
    "etl_dq_checks" -> (dqChecks _),
    "corpus_shuffle" -> (corpusShuffle _),
    "etl_incremental_agg" -> (incrementalAgg _),
    "sample_stratified" -> (sampleStratified _),
    "sample_weighted" -> (sampleWeighted _),
    "etl_merge_cdc" -> (etlMergeCdc _),
    "etl_extract" -> (extract _),
    "etl_normalize" -> (normalize _),
    "etl_snapshot_new" -> (snapshotNew _),
    "etl_snapshot_changed" -> (snapshotChanged _),
    "etl_upsert_latest" -> (upsertLatest _),
    "etl_derived_flags" -> (derivedFlags _),
    "etl_report_cards" -> (reportCards _),
    "etl_alert_delta" -> (alertDelta _),
    "sample_split" -> (sampleSplit _),
    "corpus_pipeline" -> (CorpusPipeline.corpusPipeline _)
  )

  val oracle: Map[String, String] = Map(
    // A44: salted 'sx:' md5 selection replay; export identity via the
    // ordered event-id string_agg md5
    "etl_subject_export" ->
      s"""WITH sel AS (SELECT * FROM events
         |  WHERE CAST((strpos('0123456789abcdef',
         |      substr(md5('sx:' || CAST(user_id AS VARCHAR)), 1, 1)) - 1)
         |        * 4096
         |    + (strpos('0123456789abcdef',
         |      substr(md5('sx:' || CAST(user_id AS VARCHAR)), 2, 1)) - 1)
         |        * 256
         |    + (strpos('0123456789abcdef',
         |      substr(md5('sx:' || CAST(user_id AS VARCHAR)), 3, 1)) - 1)
         |        * 16
         |    + (strpos('0123456789abcdef',
         |      substr(md5('sx:' || CAST(user_id AS VARCHAR)), 4, 1)) - 1)
         |    AS BIGINT) < $SubjectThresh)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  min(ts) AS first_ts, max(ts) AS last_ts,
         |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         |    AS value_cents,
         |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_click,
         |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_error,
         |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_purchase,
         |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_signup,
         |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_view,
         |  md5(string_agg(CAST(event_id AS VARCHAR), ','
         |    ORDER BY event_id)) AS events_fp
         |FROM sel GROUP BY user_id ORDER BY user_id""".stripMargin,
    // etl_erasure_plan: the deletion cohort replays via the strpos
    // etl_retention_plan: same integer-µs age arithmetic, O(days)/
    // O(users) collapses, 4-row TTL grid — floor div on non-negatives
    "etl_retention_plan" ->
      s"""WITH e AS (SELECT epoch_us(ts) AS us, user_id FROM events),
         |span AS (SELECT max(us) AS hi FROM e),
         |aged AS (SELECT (hi - us) // 86400000000 AS age_d, user_id
         |  FROM e CROSS JOIN span),
         |days AS (SELECT age_d, count(*) AS n_rows FROM aged
         |  GROUP BY age_d),
         |umax AS (SELECT user_id, max(age_d) AS max_age FROM aged
         |  GROUP BY user_id),
         |grid AS (SELECT CAST(unnest([${RetentionDays.mkString(", ")}])
         |    AS INT) AS ttl_days),
         |del AS (SELECT g.ttl_days,
         |    CAST(coalesce(sum(d.n_rows), 0) AS BIGINT) AS n_rows_deleted
         |  FROM grid g LEFT JOIN days d ON d.age_d >= g.ttl_days
         |  GROUP BY g.ttl_days),
         |ua AS (SELECT g.ttl_days,
         |    count(u.user_id) AS n_users_affected
         |  FROM grid g LEFT JOIN umax u ON u.max_age >= g.ttl_days
         |  GROUP BY g.ttl_days),
         |tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM days)
         |SELECT g.ttl_days, tot.n_total, del.n_rows_deleted,
         |  tot.n_total - del.n_rows_deleted AS n_rows_kept,
         |  del.n_rows_deleted * 10000 // tot.n_total AS deleted_bp,
         |  CAST(ua.n_users_affected AS BIGINT) AS n_users_affected
         |FROM grid g JOIN del USING (ttl_days) JOIN ua USING (ttl_days)
         |  CROSS JOIN tot
         |ORDER BY g.ttl_days""".stripMargin,
    // 4-hex-digit md5 decode; all counts and the amplification are
    // BIGINT floor arithmetic
    "etl_erasure_plan" ->
      s"""WITH e AS (SELECT CAST(ts AS DATE) AS day, user_id,
         |    CAST((strpos('0123456789abcdef',
         |        substr(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) * 4096
         |      + (strpos('0123456789abcdef',
         |        substr(md5(CAST(user_id AS VARCHAR)), 2, 1)) - 1) * 256
         |      + (strpos('0123456789abcdef',
         |        substr(md5(CAST(user_id AS VARCHAR)), 3, 1)) - 1) * 16
         |      + (strpos('0123456789abcdef',
         |        substr(md5(CAST(user_id AS VARCHAR)), 4, 1)) - 1)
         |      AS BIGINT) < $ErasureThresh AS del
         |  FROM events)
         |SELECT day, CAST(count(*) AS BIGINT) AS part_rows,
         |  CAST(sum(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT)
         |    AS del_rows,
         |  CAST(count(DISTINCT CASE WHEN del THEN user_id END) AS BIGINT)
         |    AS del_users,
         |  CASE WHEN sum(CASE WHEN del THEN 1 ELSE 0 END) > 0
         |    THEN CAST(count(*) * 10000
         |      // CAST(sum(CASE WHEN del THEN 1 ELSE 0 END) AS BIGINT)
         |      AS BIGINT) END AS amp_bp
         |FROM e GROUP BY day ORDER BY day""".stripMargin,
    // etl_freshness: integer-µs lag behind the corpus max (the
    // deterministic "now"), 24 h SLA flag
    "etl_freshness" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
        |g AS (SELECT max(us) AS gmax FROM e)
        |SELECT event_type, count(*) AS n_events,
        |  make_timestamp(max(us)) AS last_seen,
        |  gmax - max(us) AS lag_us,
        |  CAST(gmax - max(us) > 86400000000 AS INT) AS stale
        |FROM e CROSS JOIN g GROUP BY event_type, gmax
        |ORDER BY event_type""".stripMargin,
    // etl_drift_psi: same midpoint split (integer-µs floor div), same
    // fixed-width bins, same Laplace-smoothed shares; ln in double with
    // the shared round(·, 6) guard
    "etl_drift_psi" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us,
        |    least(CAST(floor(value / 5) AS INT), 9) AS bin FROM events),
        |span AS (SELECT min(us) AS lo, max(us) AS hi FROM e),
        |c AS (SELECT event_type, bin,
        |    CAST(sum(CASE WHEN us < lo + (hi - lo) // 2
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |    CAST(sum(CASE WHEN us < lo + (hi - lo) // 2
        |      THEN 0 ELSE 1 END) AS BIGINT) AS nc
        |  FROM e CROSS JOIN span GROUP BY 1, 2),
        |sb AS (SELECT event_type, CAST(unnest(range(0, 10)) AS INT) AS bin
        |  FROM (SELECT DISTINCT event_type FROM e)),
        |f AS (SELECT sb.event_type, sb.bin,
        |    coalesce(nb, 0) AS nb, coalesce(nc, 0) AS nc
        |  FROM sb LEFT JOIN c
        |    ON sb.event_type = c.event_type AND sb.bin = c.bin),
        |t AS (SELECT event_type, nb, nc,
        |    sum(nb) OVER (PARTITION BY event_type) AS tb,
        |    sum(nc) OVER (PARTITION BY event_type) AS tc FROM f),
        |s AS (SELECT event_type, tb, tc,
        |    (nb + 1.0) / (tb + 10.0) AS p,
        |    (nc + 1.0) / (tc + 10.0) AS q FROM t),
        |r AS (SELECT event_type,
        |    CAST(max(tb) AS BIGINT) AS n_base,
        |    CAST(max(tc) AS BIGINT) AS n_cur,
        |    round(sum((p - q) * ln(p / q)), 6) AS psi
        |  FROM s GROUP BY event_type)
        |SELECT event_type, n_base, n_cur, psi,
        |  CASE WHEN psi < 0.1 THEN 'stable'
        |       WHEN psi < 0.25 THEN 'moderate'
        |       ELSE 'shifted' END AS band
        |FROM r ORDER BY event_type""".stripMargin,
    // the oracle intentionally takes the naive one-scan-per-column
    // UNION ALL spelling — same numbers, 4× the scans the operator pays
    "etl_profile" ->
      """SELECT * FROM (
        |  SELECT 'c_custkey' AS col_name, count(*) AS n_rows,
        |    CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_nulls,
        |    count(DISTINCT c_custkey) AS n_distinct,
        |    CAST(min(c_custkey) AS VARCHAR) AS min_val,
        |    CAST(max(c_custkey) AS VARCHAR) AS max_val
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_mktsegment', count(*),
        |    CAST(sum(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    count(DISTINCT c_mktsegment),
        |    min(c_mktsegment), max(c_mktsegment)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_name', count(*),
        |    CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    count(DISTINCT c_name), min(c_name), max(c_name)
        |  FROM customer
        |  UNION ALL
        |  SELECT 'c_nationkey', count(*),
        |    CAST(sum(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT),
        |    count(DISTINCT c_nationkey),
        |    CAST(min(c_nationkey) AS VARCHAR),
        |    CAST(max(c_nationkey) AS VARCHAR)
        |  FROM customer)
        |ORDER BY col_name""".stripMargin,
    "etl_dq_checks" ->
      """SELECT * FROM (
        |  SELECT 'orders_pk_unique' AS check_name,
        |    (SELECT count(*) FROM orders) AS n_checked,
        |    (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
        |      AS n_violations
        |  UNION ALL
        |  SELECT 'orders_custkey_fk',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders WHERE NOT EXISTS (
        |      SELECT 1 FROM customer WHERE c_custkey = o_custkey))
        |  UNION ALL
        |  SELECT 'lineitem_orderkey_fk',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem WHERE NOT EXISTS (
        |      SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
        |  UNION ALL
        |  SELECT 'lineitem_qty_positive',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) FROM lineitem)
        |  UNION ALL
        |  SELECT 'orders_price_nonneg',
        |    (SELECT count(*) FROM orders),
        |    (SELECT CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) FROM orders)
        |  UNION ALL
        |  SELECT 'lineitem_ship_after_order',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT CAST(sum(CASE WHEN l_shipdate < o_orderdate
        |        THEN 1 ELSE 0 END) AS BIGINT)
        |     FROM lineitem JOIN orders ON l_orderkey = o_orderkey))
        |ORDER BY check_name""".stripMargin,
    "corpus_shuffle" ->
      """WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |s AS (SELECT doc_id, h,
        |    CAST(strpos('0123456789abcdef', substr(h, 1, 1)) - 1 AS BIGINT)
        |      AS shard
        |  FROM h)
        |SELECT doc_id, shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
        |    AS BIGINT) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,
    "corpus_pipeline" -> CorpusPipeline.oracleSql,
    "etl_incremental_agg" ->
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin,
    "etl_merge_cdc" ->
      """WITH last AS (SELECT user_id AS key, op,
        |    round(value, 2) AS new_value FROM (
        |    SELECT user_id, value,
        |      CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) t WHERE rn = 1),
        |base AS (SELECT CAST(c_custkey AS BIGINT) AS key,
        |    round(c_acctbal, 2) AS base_value
        |  FROM customer),
        |m AS (SELECT coalesce(b.key, l.key) AS key, l.op,
        |    l.new_value, b.base_value,
        |    CASE WHEN l.op IS NULL THEN 'kept'
        |      WHEN l.op = 'D' THEN 'deleted'
        |      WHEN b.base_value IS NULL THEN 'inserted'
        |      ELSE 'updated' END AS status
        |  FROM base b FULL OUTER JOIN last l ON b.key = l.key)
        |SELECT key, coalesce(new_value, base_value) AS value, status
        |FROM m WHERE status <> 'deleted' ORDER BY key""".stripMargin,
    // sample_weighted: 6-hex-digit uniform via strpos decode (md5 is
    // lowercase in both engines); pow jitter absorbed by the 10-dp
    // round before ranking
    "sample_weighted" ->
      """WITH h AS (SELECT doc_id, n_chars,
        |    md5(CAST(doc_id AS VARCHAR)) AS hx
        |  FROM documents),
        |u AS (SELECT doc_id, n_chars,
        |    (CAST((strpos('0123456789abcdef', substr(hx,1,1)) - 1) AS DOUBLE)
        |       * 1048576
        |     + (strpos('0123456789abcdef', substr(hx,2,1)) - 1) * 65536
        |     + (strpos('0123456789abcdef', substr(hx,3,1)) - 1) * 4096
        |     + (strpos('0123456789abcdef', substr(hx,4,1)) - 1) * 256
        |     + (strpos('0123456789abcdef', substr(hx,5,1)) - 1) * 16
        |     + (strpos('0123456789abcdef', substr(hx,6,1)) - 1)
        |     + 0.5) / 16777216.0 AS uu
        |  FROM h),
        |k AS (SELECT doc_id, n_chars,
        |    round(pow(uu, 1.0 / CAST(n_chars AS DOUBLE)), 10) AS key
        |  FROM u),
        |top AS (SELECT * FROM k ORDER BY key DESC, doc_id LIMIT 50)
        |SELECT doc_id, n_chars AS weight, key FROM top
        |ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """WITH h AS (SELECT lang,
        |    CAST(substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
        |      CASE WHEN lang = 'en' THEN '80' ELSE '40' END AS BIGINT)
        |      AS keep
        |  FROM documents)
        |SELECT lang, count(*) AS n_total,
        |  CAST(sum(keep) AS BIGINT) AS n_sampled,
        |  round(sum(keep) * 1.0 / count(*), 4) AS sample_rate
        |FROM h GROUP BY lang ORDER BY lang""".stripMargin,
    "sample_split" ->
      """WITH h AS (SELECT doc_id, n_chars,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hx
        |  FROM documents)
        |SELECT CASE WHEN hx < 'c0' THEN 'train'
        |    WHEN hx < 'e0' THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  round(avg(n_chars), 4) AS avg_chars
        |FROM h GROUP BY 1 ORDER BY split""".stripMargin,
    "etl_extract" ->
      """SELECT doc_id,
        |  regexp_extract(text, '^([A-Za-z]+)', 1) AS first_word,
        |  CAST(nullif(regexp_extract(text, '([0-9]+)', 1), '') AS BIGINT)
        |    AS first_int,
        |  CAST(regexp_matches(text, '[0-9]') AS INT) AS has_digit
        |FROM documents ORDER BY doc_id""".stripMargin,
    "etl_normalize" ->
      """SELECT c_custkey,
        |  upper(trim(c_name)) AS name_norm,
        |  lower(c_mktsegment) AS segment_norm,
        |  CAST(round(c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents,
        |  CASE WHEN c_acctbal < 0 THEN 'N/A'
        |    ELSE printf('%.2f', c_acctbal) END AS acctbal_display
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "etl_snapshot_new" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
        |  o_orderdate
        |FROM orders t
        |WHERE NOT EXISTS (SELECT 1 FROM orders y
        |  WHERE y.o_orderdate < TIMESTAMP '1997-01-01'
        |    AND y.o_orderkey = t.o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "etl_snapshot_changed" ->
      """WITH y AS (SELECT user_id, round(sum(value), 2) AS old_total,
        |    count(*) AS old_n
        |  FROM events WHERE ts < TIMESTAMP '2024-01-15' GROUP BY user_id),
        |t AS (SELECT user_id, round(sum(value), 2) AS new_total,
        |    count(*) AS new_n
        |  FROM events GROUP BY user_id)
        |SELECT coalesce(t.user_id, y.user_id) AS user_id,
        |  y.old_total, y.old_n, t.new_total, t.new_n,
        |  CASE WHEN y.user_id IS NULL THEN 'added'
        |    WHEN t.user_id IS NULL THEN 'removed'
        |    WHEN t.new_total = y.old_total AND t.new_n = y.old_n
        |      THEN 'unchanged'
        |    ELSE 'changed' END AS status
        |FROM t FULL OUTER JOIN y ON t.user_id = y.user_id
        |ORDER BY user_id""".stripMargin,
    "etl_upsert_latest" ->
      """SELECT user_id, event_id AS last_event_id, ts AS last_ts,
        |  event_type AS last_type, round(value, 2) AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "etl_derived_flags" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(regexp_extract(o_orderpriority, '^([0-9])', 1) AS INT)
        |    AS priority_rank,
        |  CAST(o_orderpriority IN ('1-URGENT', '2-HIGH') AS INT) AS is_urgent,
        |  CASE WHEN o_totalprice >= 200000 THEN 'high'
        |    WHEN o_totalprice >= 50000 THEN 'mid'
        |    ELSE 'low' END AS value_band
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "etl_report_cards" ->
      """SELECT c_custkey,
        |  '<div class="card"><h2>' || c_name || '</h2><p>segment: ' ||
        |  c_mktsegment || '</p><p>balance: ' || printf('%.2f', c_acctbal) ||
        |  '</p></div>' AS card_html
        |FROM (SELECT * FROM customer
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 10)
        |ORDER BY c_custkey""".stripMargin,
    "etl_alert_delta" ->
      """WITH delta AS (
        |  SELECT o_totalprice FROM orders t
        |  WHERE NOT EXISTS (SELECT 1 FROM orders y
        |    WHERE y.o_orderdate < TIMESTAMP '1997-01-01'
        |      AND y.o_orderkey = t.o_orderkey))
        |SELECT count(*) AS n_new, round(sum(o_totalprice), 2) AS new_value,
        |  CASE WHEN count(*) > 0
        |    THEN 'ALERT: ' || count(*) || ' new records'
        |    ELSE 'no-op' END AS message
        |FROM delta""".stripMargin
  )
}
