package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream operators (SURVEY.md §2 B15, B17–B20): pivot, as-of
  * join, bounded range join, JSON extraction, ordered collect.
  */
object EventOps {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** B15 `pivot_events` — long→wide. Pivot values pinned (no extra
    * distinct job, stable column set at any scale); missing cells → 0.
    */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    pivotEventsOf(Tables(spark, dir, "events"))

  /** [[pivotEvents]]'s kernel on any events-shaped frame. */
  def pivotEventsOf(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, eventTypes)
      .orderBy(col("user_id"))

  /** B17 `asof_join` — for every purchase, the latest click by the same
    * user at-or-before it. Implemented as union + running-max window:
    * one shuffle on user_id, linear scan — no per-row backward probe,
    * so it scales where a naive inequality join would not. Clicks sort
    * before purchases on equal ts so "at-or-before" includes ties.
    */
  def asofJoin(spark: SparkSession, dir: String): DataFrame =
    asofJoinOf(Tables(spark, dir, "events"))

  /** [[asofJoin]]'s kernel on any events-shaped frame. */
  def asofJoinOf(events: DataFrame): DataFrame = {
    val ev = events
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
        lit(null).cast("double").as("value"), lit(0).as("kind"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        lit(1).as("kind"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click_ts",
        max(when(col("kind") === 0, col("ts"))).over(w))
      .filter(col("kind") === 1)
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), round(col("value"), 2).as("value"),
        col("last_click_ts"))
      .orderBy(col("user_id"), col("purchase_ts"), col("purchase_id"))
  }

  /** B36 `asof_join_fwd` — FORWARD as-of join: each click finds the
    * same user's next purchase at-or-after it (time-to-conversion).
    * Same union–sort–window shape as the backward as-of (B17) with the
    * frame flipped to currentRow→unboundedFollowing: one user_id
    * shuffle, one sort, no inequality join. Purchases sort after
    * clicks on equal ts so "at-or-after" includes ties.
    */
  def asofJoinFwd(spark: SparkSession, dir: String): DataFrame =
    asofJoinFwdOf(Tables(spark, dir, "events"))

  /** [[asofJoinFwd]]'s kernel on any events-shaped frame. */
  def asofJoinFwdOf(events: DataFrame): DataFrame = {
    val ev = events
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("kind"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        lit(null).cast("long").as("event_id"), lit(1).as("kind"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    clicks.unionByName(purchases)
      .withColumn("next_purchase_ts",
        min(when(col("kind") === 1, col("ts"))).over(w))
      .filter(col("kind") === 0)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"), col("next_purchase_ts"),
        (unix_micros(col("next_purchase_ts")) - unix_micros(col("ts")))
          .as("latency_us"))
      .orderBy(col("user_id"), col("click_ts"), col("click_id"))
  }

  /** B74 `asof_join_nearest` — NEAREST-in-time as-of join, completing
    * the family: each error event finds the same user's closest click
    * in EITHER direction (the sensor-alignment / "what was the user
    * doing around the failure" join). Composed from the two directed
    * passes in ONE plan: union + a backward running-max and a forward
    * running-min window over the SAME (user_id, ts, kind) sort — one
    * shuffle, one sort, two linear window scans, no inequality join
    * ever. Equal-ts clicks sort before errors, so a tie counts as the
    * backward match at delta 0; equidistant prev/next resolves to the
    * EARLIER click (deterministic, spelled ≤ in both engines).
    */
  def asofJoinNearest(spark: SparkSession, dir: String): DataFrame =
    asofJoinNearestOf(Tables(spark, dir, "events"))

  /** [[asofJoinNearest]]'s kernel on any events-shaped frame. */
  def asofJoinNearestOf(events: DataFrame): DataFrame =
    nearestAsof(events)

  /** [[asofJoinNearest]]'s core on any (user_id, ts, event_type,
    * event_id) frame.
    */
  def nearestAsof(ev: DataFrame): DataFrame = {
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        lit(null).cast("long").as("error_id"), lit(0).as("kind"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id").as("error_id"),
        lit(1).as("kind"))
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"))
    val wB = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    clicks.unionByName(errors)
      .withColumn("prev_ts",
        max(when(col("kind") === 0, col("ts"))).over(wB))
      .withColumn("next_ts",
        min(when(col("kind") === 0, col("ts"))).over(wF))
      .filter(col("kind") === 1)
      .withColumn("nearest_click_ts",
        when(col("prev_ts").isNull, col("next_ts"))
          .when(col("next_ts").isNull, col("prev_ts"))
          .when(unix_micros(col("ts")) - unix_micros(col("prev_ts")) <=
            unix_micros(col("next_ts")) - unix_micros(col("ts")),
            col("prev_ts"))
          .otherwise(col("next_ts")))
      .withColumn("delta_us",
        unix_micros(col("nearest_click_ts")) - unix_micros(col("ts")))
      .select(col("user_id"), col("error_id"), col("ts").as("error_ts"),
        col("nearest_click_ts"), col("delta_us"))
      .orderBy(col("user_id"), col("error_ts"), col("error_id"))
  }

  /** B18 `range_join` — purchases by the same user within one hour
    * after each error event. Equi key (user_id) + bounded time range:
    * Catalyst plans the equi part as a hash join and evaluates the
    * range as a post-filter, so work stays proportional to same-user
    * pairs — the scalable shape for interval joins.
    */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame =
    rangeJoinOf(Tables(spark, dir, "events"))

  /** [[rangeJoin]]'s kernel on any events-shaped frame. */
  def rangeJoinOf(events: DataFrame): DataFrame = {
    val ev = events
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("error_id"),
        col("ts").as("error_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    errors.join(purchases,
        col("e_user") === col("p_user") &&
          col("p_ts") > col("error_ts") &&
          unix_micros(col("p_ts")) <=
            unix_micros(col("error_ts")) + 3600000000L,
        "left")
      .groupBy(col("e_user").as("user_id"), col("error_id"), col("error_ts"))
      .agg(
        count(col("p_ts")).as("n_purchases_1h"),
        round(coalesce(sum(col("p_value")), lit(0.0)), 2).as("purchase_value_1h"))
      .orderBy(col("user_id"), col("error_id"))
  }

  /** B19 `json_extract` — typed field extraction from the JSON props
    * column (≈ the reference's per-card field scraping, aiesec.py:70).
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    jsonExtractOf(Tables(spark, dir, "events"))

  /** [[jsonExtract]]'s kernel on any events-shaped frame. */
  def jsonExtractOf(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(avg(col("k")), 4).as("avg_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** B20 `arrays_collect` — per-user ordered event-type digest.
    * Output flattened to a string so the comparison (and any
    * downstream consumer) is order-stable.
    */
  def arraysCollect(spark: SparkSession, dir: String): DataFrame =
    arraysCollectOf(Tables(spark, dir, "events"))

  /** [[arraysCollect]]'s kernel on any events-shaped frame. */
  def arraysCollectOf(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        array_join(array_sort(collect_list(col("event_type"))), ",")
          .as("event_types"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))

  /** B28 `events_funnel` — ordered conversion funnel view → click →
    * purchase: a user advances a stage only with an event strictly
    * AFTER their previous stage's timestamp. All three stage times are
    * computed as conditional mins over ONE user-partitioned window —
    * a single shuffle on user_id, with the per-user reduction and the
    * tiny final stage rollup both map-side-combinable.
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame =
    eventsFunnelOf(Tables(spark, dir, "events"))

  /** [[eventsFunnel]]'s kernel on any events-shaped frame. */
  def eventsFunnelOf(events: DataFrame): DataFrame = {
    val wu = Window.partitionBy(col("user_id"))
    val staged = events
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(wu))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view"),
          col("ts"))).over(wu))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
          col("ts"))).over(wu))
      .groupBy(col("user_id"))
      .agg(first(col("t_view")).as("t_view"),
        first(col("t_click")).as("t_click"),
        first(col("t_purchase")).as("t_purchase"))
    def hrs(c: Column): Column =
      (unix_micros(c) - unix_micros(col("t_view"))) / 3.6e9
    staged.select(
      count(col("t_view")).as("n_view"),
      count(col("t_click")).as("n_click"),
      count(col("t_purchase")).as("n_purchase"),
      round(avg(hrs(col("t_click"))), 4).as("avg_hours_to_click"),
      round(avg(hrs(col("t_purchase"))), 4).as("avg_hours_to_purchase"))
  }

  /** B29 `retention_cohorts` — weekly cohort retention: users bucketed
    * by first-activity week (cohort), counted distinct in each later
    * activity week. Weeks are epoch-anchored (days-since-1970 div 7) so
    * the bucketing is calendar-library-free and engine-portable. Two
    * shuffles: the per-user first-seen reduction, then the cohort-week
    * distinct count — the user_id join in between reuses the first
    * shuffle's partitioning.
    */
  def retentionCohorts(spark: SparkSession, dir: String): DataFrame =
    retentionCohortsOf(Tables(spark, dir, "events"))

  /** [[retentionCohorts]]'s kernel on any events-shaped frame. */
  def retentionCohortsOf(events: DataFrame): DataFrame = {
    def week(c: Column): Column =
      floor(datediff(to_date(c), lit("1970-01-01")) / 7).cast("long")
    val ev = events.select(col("user_id"), col("ts"))
    val firstSeen = ev.groupBy(col("user_id"))
      .agg(week(min(col("ts"))).as("cohort_wk"))
    ev.join(firstSeen, "user_id")
      .select(col("user_id"), col("cohort_wk"),
        (week(col("ts")) - col("cohort_wk")).as("week_n"))
      .groupBy(col("cohort_wk"), col("week_n"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_wk"), col("week_n"))
  }

  /** B31 `events_anomaly` — volume-drift detection: each (event_type,
    * day)'s count against its own trailing-7-day mean (the window
    * excludes the current day, so a spike can't mask itself). Daily
    * pre-aggregation collapses the stream before the per-type window —
    * the windowed frame is O(types × days), trivially small at any
    * event volume, which is what makes this pattern safe at 100 TB.
    */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame =
    eventsAnomalyOf(Tables(spark, dir, "events"))

  /** [[eventsAnomaly]]'s kernel on any events-shaped frame. */
  def eventsAnomalyOf(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val wt = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    daily
      .withColumn("trail_raw", avg(col("n_events")).over(wt))
      .select(col("event_type"), col("day"), col("n_events"),
        round(col("trail_raw"), 4).as("trail_avg"),
        round((col("n_events") - col("trail_raw")) / col("trail_raw"), 4)
          .as("delta_pct"))
      .orderBy(col("event_type"), col("day"))
  }

  /** B32 `skew_audit` — shuffle-health diagnostic for a prospective
    * join/aggregation key: the per-key count distribution (max, mean,
    * p50/p99, max/mean skew factor) that decides whether a key needs
    * salting or AQE skew handling BEFORE the expensive job runs. Two
    * tiny shuffles: per-key counts (map-side combined), then a
    * single-row summary. At 100 TB this runs as a cheap pre-flight
    * against a sample or one partition-date.
    */
  def skewAudit(spark: SparkSession, dir: String): DataFrame =
    skewAuditOf(Tables(spark, dir, "events"))

  /** [[skewAudit]]'s kernel on any events-shaped frame. */
  def skewAuditOf(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_keys"),
        max(col("n")).as("max_n"),
        round(avg(col("n")), 4).as("avg_n"),
        round(expr("percentile(n, 0.5)"), 4).as("p50_n"),
        round(expr("percentile(n, 0.99)"), 4).as("p99_n"),
        round(max(col("n")) / avg(col("n")), 4).as("skew_factor"))

  val AttributionHorizonUs = 7L * 86400L * 1000000L // 7-day lookback
  // attributionDecay's dyadic weight 1/shiftleft(1L, wholeDays) is only
  // well-defined while the shift exponent fits a signed 64-bit value:
  // past 62 whole days the shift silently overflows on BOTH engines and
  // the weights become garbage. The horizon constant is the sole bound
  // on the exponent (the window frame clips touch age to the horizon),
  // so pin the invariant here instead of clamping inside the hot
  // expression — raising the horizon past 62 days must fail loudly at
  // class-init, not ship wrong numbers.
  require(AttributionHorizonUs / 86400000000L <= 62L,
    "attribution decay weights overflow BIGINT past a 62-day horizon")

  /** B75 `events_attribution` — last-touch conversion attribution (the
    * marketing-analytics staple the funnel/as-of family stops short
    * of): each purchase attributes to the user's most recent preceding
    * touch (click/view) within a 7-day horizon, else to 'none'. Spelled
    * as ONE per-user window pass — a null-carrying struct + `last(...,
    * ignoreNulls)` over rows strictly before the current one — never an
    * inequality join; the shuffle is the same (user_id) exchange every
    * per-user operator shares. Money sums in integer cents and delays
    * in integer µs, so every aggregate is order-free exact and the
    * oracle replays bit-for-bit.
    */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame =
    eventsAttributionOf(Tables(spark, dir, "events"))

  /** [[eventsAttribution]]'s kernel on any events-shaped frame. */
  def eventsAttributionOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("touch",
        when(col("event_type").isin("click", "view"),
          struct(unix_micros(col("ts")).as("t_us"),
            col("event_type").as("t_type"))))
      .withColumn("lt", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("in_horizon", col("lt").isNotNull &&
        (unix_micros(col("ts")) - col("lt.t_us") <= AttributionHorizonUs))
      .select(
        when(col("in_horizon"), col("lt.t_type")).otherwise("none")
          .as("touch_type"),
        when(col("in_horizon"), unix_micros(col("ts")) - col("lt.t_us"))
          .otherwise(0L).as("delay_us"),
        expr("cast(round(value * 100) as bigint)").as("v_cents"))
      .groupBy(col("touch_type"))
      .agg(
        count(lit(1)).as("n_conv"),
        sum(col("v_cents")).as("value_cents"),
        sum(col("delay_us")).as("sum_delay_us"))
      .orderBy(col("touch_type"))
  }

  /** B82 `events_attribution_decay` — time-decay MULTI-touch
    * attribution (the fractional model one up from B75's last-touch:
    * every click/view in the 7-day lookback shares the conversion's
    * credit, halving per day of age). Spelled as ONE per-user window
    * pass: a range frame `[-horizon, -1 µs]` over the event-time axis
    * collects each purchase's in-horizon touches (state bounded by
    * 7 days of per-user activity — never the full history), then an
    * explode + map computes weights; the shuffle is the same
    * (user_id) exchange the rest of the event family shares, and no
    * inequality join ever runs. Purchases with no touch credit
    * 'none' in full, so credit conservation (Σ credits ≡ Σ purchase
    * value, up to per-credit rounding) is spec-pinnable.
    *
    * Cross-engine exactness: decay weights are dyadic rationals
    * (1/2^⌊Δdays⌋ via integer shift, NOT pow() — libm pow need not be
    * exact even on powers of two), so the per-purchase weight sum is
    * order-free EXACT; the one genuine float op (the credit share) is
    * a single correctly-rounded IEEE divide+multiply on identical
    * inputs, and credits ship as rounded integer milli-cents.
    */
  def eventsAttributionDecay(spark: SparkSession, dir: String): DataFrame =
    eventsAttributionDecayOf(Tables(spark, dir, "events"))

  /** [[eventsAttributionDecay]]'s kernel on any events-shaped frame. */
  def eventsAttributionDecayOf(events: DataFrame): DataFrame =
    attributionDecay(events)

  /** [[eventsAttributionDecay]]'s kernel on any events frame. */
  private[operators] def attributionDecay(events: DataFrame): DataFrame = {
    val wr = Window.partitionBy(col("user_id")).orderBy(col("t_us"))
      .rangeBetween(-AttributionHorizonUs, -1)
    val decayW = // 1 / 2^(whole days of touch age): exact dyadic
      expr("""1.0 / cast(shiftleft(cast(1 as bigint),
             |  cast((t_us - tch.t_us) div 86400000000 as int)) as double)"""
        .stripMargin)
    events
      .withColumn("t_us", unix_micros(col("ts")))
      .withColumn("touch",
        when(col("event_type").isin("click", "view"),
          struct(col("t_us").as("t_us"), col("event_type").as("t_type"))))
      .withColumn("tl", collect_list(col("touch")).over(wr))
      .filter(col("event_type") === "purchase")
      .withColumn("v_cents", expr("cast(round(value * 100) as bigint)"))
      .withColumn("sw", expr(
        """aggregate(tl, cast(0 as double), (acc, x) ->
          |  acc + 1.0 / cast(shiftleft(cast(1 as bigint),
          |    cast((t_us - x.t_us) div 86400000000 as int)) as double))"""
          .stripMargin))
      .select(col("event_id"), col("v_cents"), col("sw"),
        explode_outer(col("tl")).as("tch"), col("t_us"))
      .select(
        coalesce(col("tch.t_type"), lit("none")).as("touch_type"),
        col("event_id"),
        when(col("tch").isNull, col("v_cents") * 1000)
          .otherwise(round(col("v_cents") * lit(1000.0) * decayW / col("sw"))
            .cast("long")).as("credit_mc"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_credits"),
        countDistinct(col("event_id")).as("n_purchases"),
        sum(col("credit_mc")).as("credit_milli_cents"))
      .orderBy(col("touch_type"))
  }

  /** B96 `events_sequence_match` horizon: the whole match must fit in
    * 72 h. µs so every comparison is BIGINT (the B75/B82 rule).
    */
  val SeqMatchWindowUs = 72L * 3600L * 1000000L

  /** B96 `events_sequence_match` — ordered-pattern detection over each
    * user's event sequence: the CEP / SQL-MATCH_RECOGNIZE primitive
    * (Flink CEP, Trino/Oracle MATCH_RECOGNIZE) that B28's funnel does
    * NOT express — the funnel counts stage reachability once per user,
    * this finds actual pattern INSTANCES: view → click → purchase
    * where the whole span fits in [[SeqMatchWindowUs]] and no `error`
    * event falls inside it, under skip-till-next-match semantics (each
    * purchase matches against the LATEST click that itself had a prior
    * view, anchored at the latest view before THAT click — the greedy
    * rightmost-predecessor chain every CEP runtime uses for this
    * quantifier-free pattern class).
    *
    * The sequential-looking semantics collapse to ONE window pass (no
    * per-user loop, no self-join): running IGNORE-NULLS `last` of the
    * view ts gives each click its anchor view; a second running `last`
    * over click rows carries the (anchor view, click) pair to each
    * purchase; a running `last` of error ts turns "no error inside the
    * span" into one comparison (last error < anchor view ⇔ the span is
    * error-free, since the span ends at the current row). Purchases
    * then filter on the three conditions and per-user rank/count
    * windows keep the FIRST instance + the instance count. Scale: one
    * user_id shuffle reused by every window; output O(users).
    * Cross-engine: µs-integer span arithmetic; the emitted span_sec is
    * floor of a <2^53 exact quotient (§5's floor-of-double rule); ties
    * are impossible in the (ts, event_id) order since event_id is
    * unique.
    */
  def eventsSequenceMatch(spark: SparkSession, dir: String): DataFrame =
    eventsSequenceMatchOf(Tables(spark, dir, "events"))

  /** [[eventsSequenceMatch]]'s kernel on any events-shaped frame. */
  def eventsSequenceMatchOf(events: DataFrame): DataFrame =
    sequenceMatch(events)

  /** [[eventsSequenceMatch]]'s kernel on any events-shaped frame. */
  private[operators] def sequenceMatch(events: DataFrame): DataFrame = {
    val wu = Window.partitionBy(col("user_id"))
    sequenceMatchInstances(events)
      .withColumn("rn",
        row_number().over(wu.orderBy(col("purchase_ts"), col("event_id"))))
      .withColumn("n_matches", count(lit(1)).over(wu))
      .filter(col("rn") === 1)
      .drop("rn", "event_id")
      .orderBy(col("user_id"))
  }

  /** EVERY pattern instance (the pre-rank frame [[sequenceMatch]]
    * summarizes): one row per matching purchase with its anchor pair.
    * This is also the batch arm of the G18 streaming detector — an
    * instance is emitted the moment its purchase arrives, so the
    * append-mode stream and this frame agree row for row.
    */
  private[graft] def sequenceMatchInstances(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isClickWithView =
      col("event_type") === "click" && col("lv").isNotNull
    val staged = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("lv",
        last(when(col("event_type") === "view", col("ts")),
          ignoreNulls = true).over(w))
      .withColumn("pv",
        last(when(isClickWithView, col("lv")), ignoreNulls = true).over(w))
      .withColumn("pc",
        last(when(isClickWithView, col("ts")), ignoreNulls = true).over(w))
      .withColumn("le",
        last(when(col("event_type") === "error", col("ts")),
          ignoreNulls = true).over(w))
    staged.filter(
      col("event_type") === "purchase" && col("pc").isNotNull &&
        unix_micros(col("ts")) - unix_micros(col("pv")) <= SeqMatchWindowUs &&
        (col("le").isNull || col("le") < col("pv")))
      .select(col("user_id"), col("event_id"), col("pv").as("view_ts"),
        col("pc").as("click_ts"), col("ts").as("purchase_ts"),
        floor((unix_micros(col("ts")) - unix_micros(col("pv"))) / lit(1e6))
          .cast("long").as("span_sec"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_sequence_match" -> (eventsSequenceMatch _),
    "events_attribution_decay" -> (eventsAttributionDecay _),
    "events_attribution" -> (eventsAttribution _),
    "skew_audit" -> (skewAudit _),
    "events_anomaly" -> (eventsAnomaly _),
    "pivot_events" -> (pivotEvents _),
    "asof_join" -> (asofJoin _),
    "asof_join_fwd" -> (asofJoinFwd _),
    "asof_join_nearest" -> (asofJoinNearest _),
    "range_join" -> (rangeJoin _),
    "json_extract" -> (jsonExtract _),
    "arrays_collect" -> (arraysCollect _),
    "events_funnel" -> (eventsFunnel _),
    "retention_cohorts" -> (retentionCohorts _)
  )

  val oracle: Map[String, String] = Map(
    // events_sequence_match: DuckDB's IGNORE-NULLS last_value replays
    // the three running carries in two window layers (lv/le, then the
    // click-pair carry that reads lv); WHERE runs before the SELECT-
    // list windows, so rn/n_matches rank the MATCHES, exactly as the
    // Spark side filters before its rank windows
    "events_sequence_match" ->
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
         |    ROWS UNBOUNDED PRECEDING)),
         |m AS (SELECT user_id, pv, pc, ts,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS n_matches
         |  FROM o2
         |  WHERE event_type = 'purchase' AND pc IS NOT NULL
         |    AND epoch_us(ts) - epoch_us(pv) <= $SeqMatchWindowUs
         |    AND (le IS NULL OR le < pv))
         |SELECT user_id, pv AS view_ts, pc AS click_ts,
         |  ts AS purchase_ts,
         |  CAST(floor((epoch_us(ts) - epoch_us(pv)) / 1e6) AS BIGINT)
         |    AS span_sec,
         |  CAST(n_matches AS BIGINT) AS n_matches
         |FROM m WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // events_attribution_decay: the window-collected in-horizon touch
    // set replays as a bounded inequality join; dyadic weights via
    // integer shift make the weight sum order-free exact
    "events_attribution_decay" ->
      s"""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us,
         |    CAST(round(value * 100) AS BIGINT) AS v_cents
         |  FROM events WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, epoch_us(ts) AS t_us, event_type
         |  FROM events WHERE event_type IN ('click', 'view')),
         |j AS (SELECT p.event_id, p.v_cents, t.event_type AS t_type,
         |    1.0 / CAST((CAST(1 AS BIGINT) <<
         |      CAST((p.t_us - t.t_us) // 86400000000 AS INT)) AS DOUBLE)
         |      AS w
         |  FROM p JOIN t ON t.user_id = p.user_id
         |    AND t.t_us BETWEEN p.t_us - $AttributionHorizonUs
         |      AND p.t_us - 1),
         |s AS (SELECT event_id, sum(w) AS sw FROM j GROUP BY 1),
         |c AS (SELECT j.t_type AS touch_type, j.event_id,
         |    CAST(round(j.v_cents * 1000.0 * j.w / s.sw) AS BIGINT) AS mc
         |  FROM j JOIN s USING (event_id)
         |  UNION ALL
         |  SELECT 'none', p.event_id, p.v_cents * 1000 FROM p
         |  WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.event_id = p.event_id))
         |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_credits,
         |  CAST(count(DISTINCT event_id) AS BIGINT) AS n_purchases,
         |  CAST(sum(mc) AS BIGINT) AS credit_milli_cents
         |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    // events_attribution: DuckDB's IGNORE NULLS last_value over the
    // same strictly-before frame; µs epochs and cent-integers keep
    // every comparison and sum engine-exact
    "events_attribution" ->
      s"""WITH o AS (SELECT user_id, ts, event_id, event_type, value,
         |    CASE WHEN event_type IN ('click', 'view')
         |      THEN {'t_us': epoch_us(ts), 't_type': event_type}
         |    END AS touch
         |  FROM events),
         |t AS (SELECT *, last_value(touch IGNORE NULLS) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
         |  FROM o),
         |p AS (SELECT
         |    CASE WHEN lt IS NOT NULL
         |        AND epoch_us(ts) - lt.t_us <= $AttributionHorizonUs
         |      THEN lt.t_type ELSE 'none' END AS touch_type,
         |    CASE WHEN lt IS NOT NULL
         |        AND epoch_us(ts) - lt.t_us <= $AttributionHorizonUs
         |      THEN epoch_us(ts) - lt.t_us ELSE 0 END AS delay_us,
         |    CAST(round(value * 100) AS BIGINT) AS v_cents
         |  FROM t WHERE event_type = 'purchase')
         |SELECT touch_type, CAST(count(*) AS BIGINT) AS n_conv,
         |  CAST(sum(v_cents) AS BIGINT) AS value_cents,
         |  CAST(sum(delay_us) AS BIGINT) AS sum_delay_us
         |FROM p GROUP BY touch_type ORDER BY touch_type""".stripMargin,
    "skew_audit" ->
      """WITH k AS (SELECT user_id, count(*) AS n
        |  FROM events GROUP BY user_id)
        |SELECT count(*) AS n_keys, max(n) AS max_n,
        |  round(avg(n), 4) AS avg_n,
        |  round(CAST(quantile_cont(n, 0.5) AS DOUBLE), 4) AS p50_n,
        |  round(CAST(quantile_cont(n, 0.99) AS DOUBLE), 4) AS p99_n,
        |  round(max(n) * 1.0 / avg(n), 4) AS skew_factor
        |FROM k""".stripMargin,
    "events_anomaly" ->
      """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n_events,
        |  round(avg(n_events) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 4) AS trail_avg,
        |  round((n_events - avg(n_events) OVER (PARTITION BY event_type
        |    ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) /
        |    avg(n_events) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 4) AS delta_pct
        |FROM d ORDER BY event_type, day""".stripMargin,
    "pivot_events" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click,
        |  count(*) FILTER (WHERE event_type = 'error') AS error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  count(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "asof_join" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |marked AS (
        |  SELECT *, max(CASE WHEN kind = 0 THEN ts END)
        |    OVER (PARTITION BY user_id ORDER BY ts, kind
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_click_ts
        |  FROM tagged)
        |SELECT user_id, event_id AS purchase_id, ts AS purchase_ts,
        |  round(value, 2) AS value, last_click_ts
        |FROM marked WHERE kind = 1
        |ORDER BY user_id, purchase_ts, purchase_id""".stripMargin,
    // asof_join_nearest: the naive directed-aggregate spelling — prev
    // via max(ts ≤ e.ts), next via min(ts > e.ts), nearest by ≤ on
    // the µs distances (ties → the earlier click, as the operator)
    "asof_join_nearest" ->
      """WITH e AS (SELECT user_id, event_id AS error_id, ts
        |    FROM events WHERE event_type = 'error'),
        |c AS (SELECT user_id, ts FROM events
        |    WHERE event_type = 'click'),
        |p AS (SELECT e.error_id, max(c.ts) AS prev_ts
        |  FROM e LEFT JOIN c
        |    ON c.user_id = e.user_id AND c.ts <= e.ts
        |  GROUP BY e.error_id),
        |n AS (SELECT e.error_id, min(c.ts) AS next_ts
        |  FROM e LEFT JOIN c
        |    ON c.user_id = e.user_id AND c.ts > e.ts
        |  GROUP BY e.error_id),
        |j AS (SELECT e.user_id, e.error_id, e.ts AS error_ts,
        |    CASE WHEN p.prev_ts IS NULL THEN n.next_ts
        |         WHEN n.next_ts IS NULL THEN p.prev_ts
        |         WHEN epoch_us(e.ts) - epoch_us(p.prev_ts) <=
        |              epoch_us(n.next_ts) - epoch_us(e.ts)
        |           THEN p.prev_ts
        |         ELSE n.next_ts END AS nearest_click_ts
        |  FROM e JOIN p USING (error_id) JOIN n USING (error_id))
        |SELECT user_id, error_id, error_ts, nearest_click_ts,
        |  epoch_us(nearest_click_ts) - epoch_us(error_ts) AS delta_us
        |FROM j ORDER BY user_id, error_ts, error_id""".stripMargin,
    "asof_join_fwd" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |marked AS (
        |  SELECT *, min(CASE WHEN kind = 1 THEN ts END)
        |    OVER (PARTITION BY user_id ORDER BY ts, kind
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |    AS next_purchase_ts
        |  FROM tagged)
        |SELECT user_id, event_id AS click_id, ts AS click_ts,
        |  next_purchase_ts,
        |  epoch_us(next_purchase_ts) - epoch_us(ts) AS latency_us
        |FROM marked WHERE kind = 0
        |ORDER BY user_id, click_ts, click_id""".stripMargin,
    "range_join" ->
      """SELECT e.user_id, e.event_id AS error_id, e.ts AS error_ts,
        |  count(p.ts) AS n_purchases_1h,
        |  round(coalesce(sum(p.value), 0), 2) AS purchase_value_1h
        |FROM events e
        |LEFT JOIN events p ON p.user_id = e.user_id
        |  AND p.event_type = 'purchase'
        |  AND p.ts > e.ts
        |  AND epoch_us(p.ts) <= epoch_us(e.ts) + 3600000000
        |WHERE e.event_type = 'error'
        |GROUP BY e.user_id, e.event_id, e.ts
        |ORDER BY e.user_id, error_id""".stripMargin,
    "json_extract" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(avg(CAST(props->>'$.k' AS INT)), 4) AS avg_k,
        |  max(CAST(props->>'$.k' AS INT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "arrays_collect" ->
      """SELECT user_id,
        |  array_to_string(list_sort(list(event_type)), ',') AS event_types,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "events_funnel" ->
      """WITH v AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
        |  FROM events GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS t_click
        |  FROM events e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.t_view
        |  GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS t_purchase
        |  FROM events e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |  GROUP BY e.user_id),
        |s AS (SELECT v.user_id, t_view, t_click, t_purchase
        |  FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id))
        |SELECT count(t_view) AS n_view, count(t_click) AS n_click,
        |  count(t_purchase) AS n_purchase,
        |  round(avg((epoch_us(t_click) - epoch_us(t_view)) / 3.6e9), 4)
        |    AS avg_hours_to_click,
        |  round(avg((epoch_us(t_purchase) - epoch_us(t_view)) / 3.6e9), 4)
        |    AS avg_hours_to_purchase
        |FROM s""".stripMargin,
    "retention_cohorts" ->
      """WITH fu AS (SELECT user_id,
        |    CAST(floor(date_diff('day', DATE '1970-01-01',
        |      CAST(min(ts) AS DATE)) / 7) AS BIGINT) AS cohort_wk
        |  FROM events GROUP BY user_id),
        |a AS (SELECT DISTINCT e.user_id, fu.cohort_wk,
        |    CAST(floor(date_diff('day', DATE '1970-01-01',
        |      CAST(e.ts AS DATE)) / 7) AS BIGINT) - fu.cohort_wk AS week_n
        |  FROM events e JOIN fu USING (user_id))
        |SELECT cohort_wk, week_n, count(*) AS n_users
        |FROM a GROUP BY cohort_wk, week_n
        |ORDER BY cohort_wk, week_n""".stripMargin
  )
}
