package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-3 analytic operators (SURVEY.md §2.B/A additions): statistical
  * aggregates (correlation, regression trend), sequence analytics
  * (event transition matrix), segmentation (RFM), three more TPC-H
  * shapes adapted to the test schema, full-frame window functions, and
  * deterministic per-group sampling.
  *
  * All follow the house rules: declarative plans, broadcast hints where
  * the optimizer can't know sizes, rounding on every float aggregate so
  * the DuckDB oracle compare is exact, deterministic tie-breaks on every
  * ordering.
  */
object Analytic {

  /** `corr_stats` — per-group second-moment statistics: Pearson
    * correlation, sample covariance, standard deviations. One pass, one
    * tiny shuffle (co-moment partials are a handful of doubles per
    * group — the mergeable-sketch shape, so 100 TB costs the same
    * shuffle as 100 MB).
    */
  def corrStats(spark: SparkSession, dir: String): DataFrame =
    corrStatsOf(Tables(spark, dir, "lineitem"))

  /** [[corrStats]]'s kernel on any lineitem-shaped frame. */
  def corrStatsOf(li: DataFrame): DataFrame =
    li
      .groupBy(col("l_returnflag"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6)
          .as("qty_price_corr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
          .as("qty_price_covar"),
        round(stddev_samp(col("l_quantity")), 6).as("qty_stddev"),
        round(stddev_samp(col("l_extendedprice")), 2).as("price_stddev"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** `regr_trend` — per-key linear regression over a daily series:
    * slope + intercept of daily revenue vs day index. The window input
    * is pre-aggregated to O(types × days) so the regression aggregate
    * (five co-moments, mergeable) never sees raw events — at scale the
    * daily rollup is the only full-data pass. Daily sums are rounded
    * before the fit so both engines regress over identical inputs.
    */
  def regrTrend(spark: SparkSession, dir: String): DataFrame =
    regrTrendOf(Tables(spark, dir, "events"))

  /** [[regrTrend]]'s kernel on any events-shaped frame. */
  def regrTrendOf(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      // exact integer-cent daily sums (r14 sweep): (type, day) groups
      // are fact-scale, and the fit must see identical inputs in both
      // engines regardless of partial-merge order
      .agg((sum(round(col("value") * 100, 0).cast("long")) / 100.0)
        .as("rev"))
      .withColumn("x",
        datediff(col("day"), lit("1997-01-01").cast("date")).cast("double"))
    daily.groupBy(col("event_type"))
      .agg(
        round(regr_slope(col("rev"), col("x")), 4).as("slope"),
        round(regr_intercept(col("rev"), col("x")), 2).as("intercept"),
        count(lit(1)).as("n_days"))
      .orderBy(col("event_type"))
  }

  /** `events_markov` — first-order transition matrix over each user's
    * event stream: P(curr | prev) with counts. One shuffle on user_id
    * for the lag window; the transition frame is O(types²) so the
    * second aggregation and its probability window are driver-trivial
    * at any scale.
    */
  def eventsMarkov(spark: SparkSession, dir: String): DataFrame =
    eventsMarkovOf(Tables(spark, dir, "events"))

  /** [[eventsMarkov]]'s kernel on any events-shaped frame. */
  def eventsMarkovOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = events
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("curr"))
      .agg(count(lit(1)).as("n"))
    trans
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("prev"))), 4))
      .orderBy(col("prev"), col("curr"))
  }

  /** B87 `cohort_ltv` — lifetime-value curves per acquisition cohort
    * (the revenue companion to B29's retention: retention counts who
    * comes back, LTV prices what they bring): customers cohorted by
    * first-order month, every order bucketed by cohort age in months,
    * cumulative revenue per cohort divided by cohort size = the
    * LTV-at-age curve a payback-period decision reads off.
    *
    * Scale shape: one orders shuffle on custkey (first-order argmin +
    * the cohort join), then everything collapses to the
    * O(cohorts × ages) cell frame — the cumulative window and the
    * cohort-size broadcast both ride on collapsed frames (B63's
    * rule). Money is integer cents end-to-end; LTV ships as
    * floor-division cents per customer (the house ratio rule), and
    * the month index m = 12·year + month makes cohort/age arithmetic
    * pure integers on both engines.
    */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame =
    cohortLtvOf(Tables(spark, dir, "orders"))

  /** [[cohortLtv]]'s kernel on any orders-shaped frame. */
  def cohortLtvOf(orders: DataFrame): DataFrame =
    ltvCurves(orders)

  /** [[cohortLtv]]'s kernel on any orders-shaped frame. */
  private[operators] def ltvCurves(orders: DataFrame): DataFrame = {
    val o = orders
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val first = o.groupBy(col("o_custkey")).agg(min(col("m")).as("cm"))
    val cohSize = first.groupBy(col("cm"))
      .agg(count(lit(1)).as("n_customers"))
    val cells = o.join(first, Seq("o_custkey"))
      .groupBy(col("cm"), (col("m") - col("cm")).as("age"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
    val w = Window.partitionBy(col("cm")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(cohSize), Seq("cm"))
      .withColumn("cum_cents", sum(col("cents")).over(w))
      .select(
        expr("make_date((cm - 1) div 12, (cm - 1) % 12 + 1, 1)")
          .as("cohort_month"),
        col("age"), col("n_customers"), col("n_orders"), col("cents"),
        col("cum_cents"),
        expr("cum_cents div n_customers").as("ltv_cents"))
      .orderBy(col("cohort_month"), col("age"))
  }

  val MedianBucket = 10000L // pass-1 bucket width: $100 in cents

  /** B88 `agg_exact_median` — EXACT per-group median at scale by
    * bucketed two-phase search, the pattern that replaces a full
    * per-group sort (what `percentile`/`median` cost — at 100 TB a
    * corpus-wide sort for one number): phase 1 collapses the fact
    * scan map-side to O(groups × buckets) coarse-bucket counts and
    * walks the cumulative over that tiny frame to find each group's
    * median bucket and the rank still needed inside it; phase 2
    * re-collapses ONLY the located buckets by exact value (a
    * semi-join-pruned second scan — reads one bucket's rows per
    * group) and walks their cumulative to the k-th value. Both walks
    * window over collapsed frames (B63's rule); everything is integer
    * cents, k = ⌈n/2⌉ (the lower median — an order statistic, so no
    * interpolation float). The oracle computes the SAME number by the
    * naive row_number-over-full-sort definition — two different
    * algorithms agreeing exactly is the point.
    */
  def aggExactMedian(spark: SparkSession, dir: String): DataFrame =
    aggExactMedianOf(Tables(spark, dir, "events"))

  /** [[aggExactMedian]]'s kernel on any events-shaped frame. */
  def aggExactMedianOf(events: DataFrame): DataFrame =
    exactMedian(events)

  /** [[aggExactMedian]]'s kernel on any events frame. */
  private[operators] def exactMedian(events: DataFrame): DataFrame = {
    val vals = events.select(col("event_type"),
      expr("cast(round(value * 100) as bigint)").as("cents"))
    // phase 1: coarse buckets, located per group
    val buckets = vals
      .groupBy(col("event_type"),
        floor(col("cents") / MedianBucket).cast("long").as("b"))
      .agg(count(lit(1)).as("c"))
    val wb = Window.partitionBy(col("event_type")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val located = buckets
      .withColumn("cum_before", coalesce(sum(col("c")).over(wb), lit(0L)))
      .withColumn("n", sum(col("c"))
        .over(Window.partitionBy(col("event_type"))))
      .withColumn("k", expr("(n + 1) div 2"))
      .filter(col("cum_before") < col("k") &&
        col("cum_before") + col("c") >= col("k"))
      .select(col("event_type"), col("b"), col("n"), col("k"),
        (col("k") - col("cum_before")).as("r"))
    // phase 2: exact values of the located bucket only
    val inBucket = vals
      .join(broadcast(located), Seq("event_type"))
      .filter(floor(col("cents") / MedianBucket).cast("long") === col("b"))
      .groupBy(col("event_type"), col("n"), col("k"), col("r"),
        col("cents"))
      .agg(count(lit(1)).as("vc"))
    val wv = Window.partitionBy(col("event_type")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    inBucket
      .withColumn("vcum_before", coalesce(sum(col("vc")).over(wv), lit(0L)))
      .filter(col("vcum_before") < col("r") &&
        col("vcum_before") + col("vc") >= col("r"))
      .select(col("event_type"), col("n").as("n_events"), col("k"),
        col("cents").as("median_cents"))
      .orderBy(col("event_type"))
  }

  /** B89 `events_streaks` — gaps-and-islands consecutive-day activity
    * streaks per user (the engagement metric behind "N-day streak"
    * product features, and the canonical SQL islands pattern): one
    * shuffle on user_id; distinct active days, row_number along the
    * day order, island key = epoch-day − rn (constant exactly while
    * days are consecutive — pure integer), then islands collapse to
    * per-user streak stats. Longest-streak ties break to the EARLIEST
    * start (max_by on (len, −start_epoch) — deterministic both
    * engines).
    */
  def eventsStreaks(spark: SparkSession, dir: String): DataFrame =
    eventsStreaksOf(Tables(spark, dir, "events"))

  /** [[eventsStreaks]]'s kernel on any events-shaped frame. */
  def eventsStreaksOf(events: DataFrame): DataFrame =
    streaks(events)

  /** [[eventsStreaks]]'s kernel on any events frame. */
  private[operators] def streaks(events: DataFrame): DataFrame = {
    val days = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .withColumn("ep", datediff(col("day"), lit("1970-01-01").cast("date"))
        .cast("long"))
    val wd = Window.partitionBy(col("user_id")).orderBy(col("ep"))
    val islands = days
      .withColumn("grp", col("ep") - row_number().over(wd))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"),
        min(col("ep")).as("start_ep"))
    islands
      .groupBy(col("user_id"))
      .agg(
        sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"),
        max_by(col("start_day"),
          struct(col("len").as("l"), (-col("start_ep")).as("t")))
          .as("longest_start"))
      .orderBy(col("user_id"))
  }

  /** `orders_rfm` — RFM segmentation: per-customer recency (days since
    * last order, vs the global max date), frequency (order count),
    * monetary (total spend) → ntile(4) each (deterministic tie-break on
    * custkey) → 3-digit segment, reported as segment-level rollup.
    * The global-max reference date is a one-row broadcast; the ntile
    * windows are global sorts over the per-customer frame — already
    * 1000× smaller than orders; at larger scale swap ntile for
    * approx-quantile cut points (same segment semantics, no global
    * sort).
    */
  def ordersRfm(spark: SparkSession, dir: String): DataFrame =
    ordersRfmOf(Tables(spark, dir, "orders"))

  /** [[ordersRfm]]'s kernel on any orders-shaped frame. */
  def ordersRfmOf(orders: DataFrame): DataFrame = {
    val ord = orders
    val refDate = ord.agg(max(col("o_orderdate")).as("ref_date"))
    val perCust = ord.groupBy(col("o_custkey"))
      .agg(
        max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        round(sum(col("o_totalprice")), 2).as("monetary"))
      .crossJoin(broadcast(refDate))
      .withColumn("recency",
        datediff(col("ref_date"), col("last_order")).cast("long"))
    val seg = perCust
      .withColumn("r_q", ntile(4).over(
        Window.orderBy(col("recency"), col("o_custkey"))))
      .withColumn("f_q", ntile(4).over(
        Window.orderBy(col("frequency").desc, col("o_custkey"))))
      .withColumn("m_q", ntile(4).over(
        Window.orderBy(col("monetary").desc, col("o_custkey"))))
      .withColumn("segment",
        concat(col("r_q"), col("f_q"), col("m_q")))
    seg.groupBy(col("segment"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(avg(col("recency")), 4).as("avg_recency"),
        round(avg(col("frequency")), 4).as("avg_frequency"),
        round(avg(col("monetary")), 2).as("avg_monetary"))
      .orderBy(col("segment"))
  }

  /** `q6_revenue` — TPC-H Q6: single-table filter + scalar aggregate.
    * The plan to demand: every predicate in PushedFilters, two-column
    * ReadSchema, one partial-agg exchange carrying one row per task.
    * Decimal-cast accumulation so the cent-level sum is
    * order-independent across engines.
    */
  def q6Revenue(spark: SparkSession, dir: String): DataFrame =
    q6RevenueOf(Tables(spark, dir, "lineitem"))

  /** [[q6Revenue]]'s kernel on any lineitem-shaped frame. */
  def q6RevenueOf(li: DataFrame): DataFrame =
    li
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        round(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(18,4)")), 2).cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))

  /** `q4_priority` — TPC-H Q4 shape on the available schema: orders in
    * a quarter with EXISTS(lineitem qty > 45), counted per priority.
    * The semi join probes a distinct-key hash set — no row
    * multiplication — and the date filter prunes the orders scan before
    * the shuffle.
    */
  def q4Priority(spark: SparkSession, dir: String): DataFrame =
    q4PriorityOf(Tables(spark, dir, "orders"),
      Tables(spark, dir, "lineitem"))

  /** [[q4Priority]]'s kernel on caller orders/lineitem frames. */
  def q4PriorityOf(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val ord = orders
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
    val heavy = lineitem
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"))
    ord.join(heavy, ord("o_orderkey") === heavy("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** `q10_returns` — TPC-H Q10 shape: revenue lost to returns per
    * customer, top 20. lineitem↔orders shuffles on orderkey; customer
    * joins on custkey; nation broadcasts; TakeOrderedAndProject caps
    * the result without a global sort.
    */
  def q10Returns(spark: SparkSession, dir: String): DataFrame =
    q10ReturnsOf(Tables(spark, dir, "customer"),
      Tables(spark, dir, "nation"), Tables(spark, dir, "orders"),
      Tables(spark, dir, "lineitem"))

  /** [[q10Returns]]'s kernel on the four caller frames. */
  def q10ReturnsOf(cust: DataFrame, nation: DataFrame,
      orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val ord = orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val li = lineitem
      .filter(col("l_returnflag") === "R")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** `q7_volume_shipping` — TPC-H Q7: bilateral trade volume between
    * two nations by ship year. The nation dims are pre-filtered to the
    * two nations of interest BEFORE joining, so the inner joins
    * themselves prune supplier/customer rows to ~2/25 of the fact
    * stream ahead of the orderkey shuffle; only the cross-pair filter
    * (drop same-nation flows) runs post-join.
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame =
    q7VolumeShippingOf(Tables(spark, dir, "nation"),
      Tables(spark, dir, "lineitem"), Tables(spark, dir, "orders"),
      Tables(spark, dir, "customer"), Tables(spark, dir, "supplier"))

  /** [[q7VolumeShipping]]'s kernel on the five caller frames. */
  def q7VolumeShippingOf(nation: DataFrame, lineitem: DataFrame,
      ord: DataFrame, cust: DataFrame, sup: DataFrame): DataFrame = {
    // 4-nation trade bloc (2 is empty at the smallest test SF)
    val nations = Seq("NATION_0", "NATION_1", "NATION_2", "NATION_3")
    val n1 = nation
      .filter(col("n_name").isin(nations: _*))
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = nation
      .filter(col("n_name").isin(nations: _*))
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    val li = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n1), sup("s_nationkey") === col("s_nkey"))
      .join(broadcast(n2), cust("c_nationkey") === col("c_nkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")), 2).cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** `q14_promo` — TPC-H Q14: promo revenue share for one ship-month.
    * part joins as a broadcast dim; numerator and denominator are
    * decimal-cast cent-exact sums rounded BEFORE the ratio so both
    * engines divide identical numbers.
    */
  def q14Promo(spark: SparkSession, dir: String): DataFrame =
    q14PromoOf(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "part"))

  /** [[q14Promo]]'s kernel on caller lineitem/part frames. */
  def q14PromoOf(lineitem: DataFrame, partTbl: DataFrame): DataFrame = {
    val li = lineitem
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val part = partTbl
      .select(col("p_partkey"), col("p_type"))
    val disc = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast("decimal(18,4)")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .agg(
        round(sum(when(col("p_type").startsWith("PROMO"), disc)
          .otherwise(lit(0).cast("decimal(18,4)"))), 2).cast("double")
          .as("promo_revenue"),
        round(sum(disc), 2).cast("double").as("total_revenue"))
      .withColumn("promo_pct",
        round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 4))
  }

  /** `win_first_last` — full-frame window functions: first/last/2nd
    * event value per user over the (ts, event_id) order. One shuffle on
    * user_id; first/last/nth share the single in-partition sort, and
    * the row_number filter keeps one row per user without a second
    * aggregation.
    */
  def winFirstLast(spark: SparkSession, dir: String): DataFrame =
    winFirstLastOf(Tables(spark, dir, "events"))

  /** [[winFirstLast]]'s kernel on any events-shaped frame. */
  def winFirstLastOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val full = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    events
      .withColumn("first_value", round(first(col("value")).over(full), 2))
      .withColumn("last_value", round(last(col("value")).over(full), 2))
      .withColumn("second_value", round(nth_value(col("value"), 2).over(full), 2))
      .withColumn("n_events", count(lit(1)).over(full))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("first_value"), col("last_value"),
        col("second_value"), col("n_events"))
      .orderBy(col("user_id"))
  }

  /** `sample_pergroup` — deterministic per-group k-sample: the first 10
    * docs per language in md5(doc_id) order. Engine- and run-stable
    * (the hash IS the ordering), and planned on the H5 bounded-heap
    * [[graft.plans.TopKPerGroup]] operator rather than a window: each
    * task keeps an O(groups × k) heap, ships only survivors into the
    * group-key shuffle, and never sorts a full partition — a window
    * row_number must sort EVERY doc per language before the rank
    * filter drops all but 10, which at 100 TB is a corpus-wide sort
    * for a 50-row answer. The uniform-without-replacement sampler you
    * can re-run over 100 TB and get the same rows.
    */
  def samplePergroup(spark: SparkSession, dir: String): DataFrame =
    samplePergroupOf(Tables(spark, dir, "documents"))

  /** [[samplePergroup]]'s kernel on any documents-shaped frame. */
  def samplePergroupOf(docs: DataFrame): DataFrame = {
    val hashed = docs
      .select(col("lang"), col("doc_id"), col("n_chars"),
        md5(col("doc_id").cast("string")).as("h"))
    graft.plans.TopKOps.topK(hashed,
        groupBy = Seq("lang"),
        orderBy = Seq("h" -> true, "doc_id" -> true),
        k = 10, rankName = "sample_rank")
      .select(col("lang"), col("sample_rank").cast("long").as("sample_rank"),
        col("doc_id"), col("n_chars"))
      .orderBy(col("lang"), col("sample_rank"))
  }

  /** The rare-event threshold for [[tsGapfill]] — high enough that the
    * daily series actually has holes at the test SFs (a dense series
    * exercises the join but never the fill).
    */
  val GapfillThreshold = 200.0

  /** `ts_gapfill` — calendar gap-fill + forward fill, the standard
    * time-series repair in front of any trend/anomaly stage: rare-event
    * daily counts land on a dense (type × day) calendar spine built
    * from one broadcast min/max span row; missing days get zero counts
    * and carry the last observed daily sum forward (running `last`
    * with ignoreNulls — one in-partition sort per type, no self-join).
    * The spine is O(types × days) regardless of event volume.
    */
  def tsGapfill(spark: SparkSession, dir: String): DataFrame =
    tsGapfillOf(Tables(spark, dir, "events"))

  /** [[tsGapfill]]'s kernel on any events-shaped frame. */
  def tsGapfillOf(events: DataFrame): DataFrame = {
    val daily = events
      .filter(col("value") >= GapfillThreshold)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
    val span = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val cal = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"),
        explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("event_type", "day"), "left")
      .withColumn("is_gap", when(col("n").isNull, 1L).otherwise(0L))
      .withColumn("n_events", coalesce(col("n"), lit(0L)))
      .withColumn("filled_value",
        round(coalesce(last(col("v"), ignoreNulls = true).over(w),
          lit(0.0)), 2))
      .select(col("event_type"), col("day"), col("n_events"),
        col("is_gap"), col("filled_value"))
      .orderBy(col("event_type"), col("day"))
  }

  /** `robust_stats` — outlier-resistant per-group dispersion: median,
    * MAD (median absolute deviation), IQR. Two percentile passes (the
    * MAD's deviations need the group median first); the median frame is
    * group-cardinality-sized and broadcasts back. The robust triple is
    * what drives thresholding on heavy-tailed value distributions where
    * mean/stddev are hostage to the tail.
    */
  def robustStats(spark: SparkSession, dir: String): DataFrame =
    robustStatsOf(Tables(spark, dir, "events"))

  /** [[robustStats]]'s kernel on any events-shaped frame. */
  def robustStatsOf(events: DataFrame): DataFrame = {
    val quart = events
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("med_raw"),
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.75)").as("p75"))
    events
      .join(broadcast(quart), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(max(col("med_raw")), 4).as("med"),
        round(expr("percentile(abs(value - med_raw), 0.5)"), 4).as("mad"),
        round(max(col("p75")) - max(col("p25")), 4).as("iqr"))
      .orderBy(col("event_type"))
  }

  /** `win_distribution` — value-based distribution windows: each
    * customer's spend percentile (percent_rank) and cumulative share of
    * customers (cume_dist) WITHIN their priority stratum. Both
    * functions are tie-aware (rank by value, not row), so results are
    * deterministic without an id tiebreak in the ORDER BY — and the
    * window input is the pre-aggregated O(customers) frame.
    */
  def winDistribution(spark: SparkSession, dir: String): DataFrame =
    winDistributionOf(Tables(spark, dir, "orders"))

  /** [[winDistribution]]'s kernel on any orders-shaped frame. */
  def winDistributionOf(orders: DataFrame): DataFrame = {
    val totals = orders
      .groupBy(col("o_orderpriority"), col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("total_d"))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("total_d"))
    // deliberately UNROUNDED: both functions are one IEEE division of
    // integers ((rank-1)/(n-1), peers/n) — bit-identical in any engine —
    // while rounding them hits .5-ulp ties where Spark's HALF_UP and
    // C-library rounding disagree
    totals
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .select(col("o_orderpriority"), col("o_custkey"),
        round(col("total_d"), 2).cast("double").as("total_spend"),
        col("pct_rank"), col("cume"))
      .orderBy(col("o_orderpriority"), col("o_custkey"))
  }

  /** `abc_pareto` — cumulative-contribution classification: parts
    * ranked by exact decimal revenue, running share against the grand
    * total, bucketed A (first 50% of revenue) / B (to 80%) / C (tail).
    *
    * The running sum operates on the PRE-AGGREGATED per-part frame
    * (O(parts)) in exact decimal, but parts is still SF-linear, so a
    * bare `Window.orderBy` (single-partition global sort) would be a
    * one-task stage at 100 TB. Scale-safe spelling of a global
    * cumulative sum: range-partition on the global sort key, prefix-sum
    * WITHIN each partition in parallel, then add back per-partition
    * offsets — an O(numPartitions) frame that cumulates on the driver
    * scale (32 rows) and broadcasts. `persist()` pins ONE
    * materialization of the range exchange so the offsets branch and
    * the row branch cannot disagree on sampled partition bounds
    * (RangePartitioner bounds are sample-derived and not stable across
    * re-executions). Exact decimal partials keep run_share
    * order-independent, so the result is bit-identical to the
    * single-window spelling the oracle uses.
    */
  def abcPareto(spark: SparkSession, dir: String): DataFrame =
    abcParetoOf(Tables(spark, dir, "lineitem"))

  /** [[abcPareto]]'s kernel on any lineitem-shaped frame. */
  def abcParetoOf(lineitem: DataFrame): DataFrame = {
    val nPart = lineitem.sparkSession.sparkContext.defaultParallelism
    val perPart = lineitem
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast("decimal(18,4)")).as("rev_d"))
    val ranged = perPart
      .repartitionByRange(nPart, col("rev_d").desc, col("l_partkey"))
      .withColumn("pid", spark_partition_id())
      .persist()
    // O(numPartitions) rows: the one place a global-order window is
    // safe — it cumulates partition subtotals, never data rows.
    val offOrd = Window.orderBy(col("pid"))
    val offsets = ranged.groupBy(col("pid"))
      .agg(sum(col("rev_d")).as("part_d"))
      .select(col("pid"),
        coalesce(sum(col("part_d")).over(
            offOrd.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0).cast("decimal(38,4)")).as("off_d"),
        sum(col("part_d")).over(
          offOrd.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)).as("total_d"))
    val wIn = Window.partitionBy(col("pid"))
      .orderBy(col("rev_d").desc, col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged.join(broadcast(offsets), Seq("pid"))
      .withColumn("run_share",
        round((sum(col("rev_d")).over(wIn) + col("off_d")).cast("double") /
          col("total_d").cast("double"), 6))
      .withColumn("abc_class",
        when(col("run_share") <= 0.5, "A")
          .when(col("run_share") <= 0.8, "B").otherwise("C"))
      .select(col("l_partkey").as("p_partkey"),
        round(col("rev_d"), 2).cast("double").as("revenue"),
        col("run_share"), col("abc_class"))
      .orderBy(col("run_share"), col("p_partkey"))
  }

  /** `events_cooccur` — event-type co-occurrence with lift: for each
    * unordered type pair, in how many (user, day) baskets both appear,
    * and lift = P(ab)·N / (P(a)·P(b)) against independence. The basket
    * frame reduces to DISTINCT (user, day, type) first, so the
    * self-join fans out at most types²/2 pairs per basket — bounded by
    * the type cardinality, not event volume.
    */
  def eventsCooccur(spark: SparkSession, dir: String): DataFrame =
    eventsCooccurOf(Tables(spark, dir, "events"))

  /** [[eventsCooccur]]'s kernel on any events-shaped frame. */
  def eventsCooccurOf(events: DataFrame): DataFrame = {
    val baskets = events
      .select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_type")).distinct()
    val perType = baskets.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_type"))
    val n = baskets.select(col("user_id"), col("day")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val a = baskets.select(col("user_id"), col("day"),
      col("event_type").as("type_a"))
    val b = baskets.select(col("user_id"), col("day"),
      col("event_type").as("type_b"))
    a.join(b, Seq("user_id", "day"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(perType.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("n_type", "n_a")), Seq("type_a"))
      .join(broadcast(perType.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("n_type", "n_b")), Seq("type_b"))
      .crossJoin(broadcast(n))
      .withColumn("lift", round(col("n_both").cast("double") *
        col("n_baskets") / (col("n_a") * col("n_b")), 6))
      .select(col("type_a"), col("type_b"), col("n_both"),
        col("n_a"), col("n_b"), col("lift"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Histogram-sketch geometry for [[aggHistQuantiles]]: fixed
    * data-independent bucket boundaries (width 8, clamped to 128
    * buckets) — fixed boundaries are what make the sketch mergeable by
    * plain count addition AND bit-deterministic under any partition /
    * merge order, unlike sampling sketches.
    */
  val HistW = 8.0
  val HistBuckets = 128

  /** `agg_hist_quantiles` — mergeable-sketch quantiles, the scale path
    * for exact `agg_percentiles`: per-(type, day) histogram partials
    * (the sketch table a nightly job maintains) merge by count-sum into
    * per-type histograms, and p50/p95 interpolate linearly inside the
    * covering bucket from the cumulative counts. The query runs
    * partial→merge explicitly while the oracle replays the same
    * two-stage plan in SQL — the merge≡direct guarantee is inside the
    * hash compare. Shuffles carry O(types × days × buckets) counters,
    * never raw values; error is bounded by the bucket width (spec).
    */
  def aggHistQuantiles(spark: SparkSession, dir: String): DataFrame =
    aggHistQuantilesOf(Tables(spark, dir, "events"))

  /** [[aggHistQuantiles]]'s kernel on any events-shaped frame. */
  def aggHistQuantilesOf(events: DataFrame): DataFrame = {
    val partials = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"),
        least(floor(col("value") / HistW), lit(HistBuckets - 1))
          .cast("long").as("bucket"))
      .agg(count(lit(1)).as("pn"))
    val merged = partials.groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("pn")).as("n"))
    val cum = merged
      .withColumn("cum", sum(col("n")).over(
        Window.partitionBy(col("event_type")).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n")).over(
        Window.partitionBy(col("event_type"))))
    def pick(q: Double, name: String): DataFrame = cum
      .filter(col("cum") >= col("total") * q)
      .groupBy(col("event_type"))
      .agg(min(struct(col("bucket"), col("n"), col("cum"), col("total")))
        .as("s"))
      .select(col("event_type"),
        round(col("s.bucket") * HistW.toLong +
          lit(HistW) * (col("s.total") * q - (col("s.cum") - col("s.n"))) /
            col("s.n"), 4).as(name))
    cum.groupBy(col("event_type")).agg(max(col("total")).as("n_events"))
      .join(pick(0.5, "p50_approx"), Seq("event_type"))
      .join(pick(0.95, "p95_approx"), Seq("event_type"))
      .orderBy(col("event_type"))
  }

  /** `ts_ewma` — exponentially weighted moving average over each
    * type's daily revenue series (the trend-smoothing primitive behind
    * drift monitors and forecast baselines). Sequential state done
    * scale-correctly: one shuffle pre-aggregates events to the
    * O(types × days) daily frame, then the recurrence
    * s_t = (3·x_t + 7·s_{t−1}) / 10 runs as an in-row `aggregate`
    * fold over the collected per-type series — per-type state never
    * crosses rows, so there is no driver loop and no O(n) window
    * chain. The fold runs in FIXED-POINT (bigint cents, floor
    * division): a float recurrence with decimal weights lands its
    * state exactly ON round-half boundaries (0.3·x of 2-dp inputs is
    * decimal-grid), where Spark's HALF_UP-on-shortest-repr and
    * DuckDB's binary-double rounding legitimately disagree — integer
    * state makes every step exactly reproducible on any engine. The
    * ≤1-cent-per-step floor bias is noise for a smoothing signal. The
    * division is spelled as a TRUE floor (subtract pmod, then exact
    * div) because Spark's `div` truncates toward zero while DuckDB's
    * `//` floors — they'd diverge the first time a daily sum went
    * negative (refund-heavy day); floor-consistent integer math keeps
    * the recurrence engine-exact for any sign.
    */
  def tsEwma(spark: SparkSession, dir: String): DataFrame =
    tsEwmaOf(Tables(spark, dir, "events"))

  /** [[tsEwma]]'s kernel on any events-shaped frame. */
  def tsEwmaOf(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")) * 100, 0).cast("long").as("cents"))
    daily
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("day"), col("cents"))))
        .as("series"))
      .select(col("event_type"), col("series"),
        posexplode(col("series")).as(Seq("p", "s")))
      .withColumn("ewma_cents", expr(
        """aggregate(slice(series, 2, p), element_at(series, 1).cents,
          |  (acc, x) -> (3 * x.cents + 7 * acc
          |    - pmod(3 * x.cents + 7 * acc, 10)) div 10)""".stripMargin))
      .select(col("event_type"), col("s.day").as("day"),
        (col("s.cents") / 100.0).as("rev"),
        (col("ewma_cents") / 100.0).as("ewma"))
      .orderBy(col("event_type"), col("day"))
  }

  /** `ts_holt` — Holt's linear-trend smoothing (double exponential):
    * the canonical one-step-ahead forecast baseline, one level up from
    * [[tsEwma]]'s single-state recurrence. Per type-day revenue series:
    * l_t = (5·x_t + 5·(l_{t−1} + t_{t−1}))/10 (α = 0.5),
    * t_t = (3·(l_t − l_{t−1}) + 7·t_{t−1})/10 (β = 0.3),
    * forecast_next = l_t + t_t. Same scale shape as ts_ewma: one
    * shuffle to the O(types × days) daily frame, recurrence as an
    * in-row fold, no driver loop, no window chain. Same fixed-point
    * discipline too — bigint cents with TRUE floor division (subtract
    * pmod, then exact div) — but the state is now a PAIR, carried as a
    * named_struct accumulator; the trend can go negative on a dip, so
    * the floor spelling (not truncation) is what keeps Spark and the
    * oracle's `//` on identical integers at every step.
    */
  def tsHolt(spark: SparkSession, dir: String): DataFrame =
    tsHoltOf(Tables(spark, dir, "events"))

  /** [[tsHolt]]'s kernel on any events-shaped frame. */
  def tsHoltOf(events: DataFrame): DataFrame =
    holtCentsOf(events)
      .select(col("event_type"), col("day"),
        (col("rev_cents") / 100.0).as("rev"),
        (col("level_cents") / 100.0).as("level"),
        (col("trend_cents") / 100.0).as("trend"),
        ((col("level_cents") + col("trend_cents")) / 100.0)
          .as("forecast_next"))
      .orderBy(col("event_type"), col("day"))

  /** The integer-cents Holt state frame behind `ts_holt` and
    * `ts_backtest` (one row per type-day with level/trend after
    * folding that day).
    */
  private def holtCentsOf(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")) * 100, 0).cast("long").as("cents"))
    // the new level appears inside the trend update; SQL lambdas have
    // no let-binding, so l_t's expression repeats (same integers)
    val lNew = "(5 * x.cents + 5 * (acc.l + acc.t)" +
      " - pmod(5 * x.cents + 5 * (acc.l + acc.t), 10)) div 10"
    daily
      .groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("day"), col("cents"))))
        .as("series"))
      .select(col("event_type"), col("series"),
        posexplode(col("series")).as(Seq("p", "s")))
      .withColumn("st", expr(
        s"""aggregate(slice(series, 2, p),
           |  named_struct('l', element_at(series, 1).cents,
           |               't', CAST(0 AS BIGINT)),
           |  (acc, x) -> named_struct(
           |    'l', $lNew,
           |    't', (3 * (($lNew) - acc.l) + 7 * acc.t
           |      - pmod(3 * (($lNew) - acc.l) + 7 * acc.t, 10))
           |      div 10))""".stripMargin))
      .select(col("event_type"), col("s.day").as("day"),
        col("s.cents").as("rev_cents"),
        col("st.l").as("level_cents"), col("st.t").as("trend_cents"))
  }

  /** B92 `ts_backtest` — walk-forward one-step forecast evaluation,
    * the eval-as-data row for the forecasting stack (C37/D10/E22's
    * pattern applied to `ts_holt`: a forecaster ships only if it
    * beats the PERSISTENCE baseline — "tomorrow equals today" — on a
    * backtest, and this is the per-series table that decision reads):
    * each day's Holt forecast (level + trend after folding the day)
    * is scored against the NEXT day's actual, alongside the naive
    * forecast; per type the report carries eval count, both MAEs in
    * exact floor-division cents (non-negative sums, so floor ≡
    * truncate cross-engine), the signed total error as a plain
    * integer sum (no division — engines disagree on negative floor),
    * and the holt-beats-naive flag. One O(types × days) frame end to
    * end; the lead window and rollup ride the collapsed frame.
    */
  def tsBacktest(spark: SparkSession, dir: String): DataFrame =
    tsBacktestOf(Tables(spark, dir, "events"))

  /** [[tsBacktest]]'s kernel on any events-shaped frame. */
  def tsBacktestOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    holtCentsOf(events)
      .withColumn("fc", col("level_cents") + col("trend_cents"))
      .withColumn("next_rev", lead(col("rev_cents"), 1).over(w))
      .filter(col("next_rev").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_evals"),
        expr("sum(abs(next_rev - fc)) div count(1)").as("mae_holt_cents"),
        expr("sum(abs(next_rev - rev_cents)) div count(1)")
          .as("mae_naive_cents"),
        sum(col("next_rev") - col("fc")).as("err_total_cents"))
      .withColumn("holt_wins",
        (col("mae_holt_cents") <= col("mae_naive_cents")).cast("int"))
      .orderBy(col("event_type"))
  }

  /** `ts_changepoint` — offline CUSUM changepoint detection over each
    * type's daily event-volume series: "did the level shift, and on
    * which day" — the question behind the reference's daily
    * snapshot-diff alerts, answered over the whole history instead of
    * one day pair. With cum_t the running count, T the series total,
    * and n the day count, the scaled CUSUM statistic
    * n·S_t = n·cum_t − t·T is INTEGER-exact (no mean, no floats); the
    * changepoint is the day maximizing |n·S_t| (earliest on ties) and
    * the shift flag is the λ=3 Brownian-bridge bar 2·stat > 3·n·√T,
    * compared SQUARED — 4·stat² > 9·n²·T — in decimal(38,0) /
    * HUGEINT (stat ≤ n·T would overflow a BIGINT squared long before
    * the data stops fitting a cluster). decimal(38,0) is exact
    * through stat ≈ 2.5·10¹⁸ — about 10⁶× the 100 TB design point
    * (n·T there is ~10¹⁶ type-day events); past it Spark's non-ANSI
    * decimal multiply returns null, so the flag coalesces to 1: a
    * statistic too large to SQUARE in 38 digits is an alarm, not a
    * silent null. Scale shape: one fact-scale map-side-combined
    * shuffle down to the O(types × days) daily frame; cumsum, argmax,
    * and the flag all run there.
    */
  def tsChangepoint(spark: SparkSession, dir: String): DataFrame =
    tsChangepointOf(Tables(spark, dir, "events"))

  /** [[tsChangepoint]]'s kernel on any events-shaped frame. */
  def tsChangepointOf(events: DataFrame): DataFrame =
    changepoint(events)

  /** [[tsChangepoint]]'s core on any (event_type, ts) frame. */
  def changepoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val wt = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val cum = daily
      .withColumn("p", row_number().over(wt))
      .withColumn("cum", sum(col("n")).over(wt))
    val tot = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("total"))
    val wr = Window.partitionBy(col("event_type"))
      .orderBy(col("a").desc, col("p"))
    cum.join(tot, Seq("event_type"))
      // t = n has S_t = 0 by construction; a boundary "changepoint"
      // at the last day would be the no-change case anyway
      .filter(col("p") < col("n_days"))
      .withColumn("a",
        abs(col("n_days") * col("cum") - col("p") * col("total")))
      .withColumn("rn", row_number().over(wr))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n_days"), col("total"),
        col("day").as("cp_day"), col("a").as("stat"),
        coalesce(
          (lit(4).cast("decimal(38,0)") * col("a") * col("a") >
            lit(9).cast("decimal(38,0)") * col("n_days") * col("n_days")
              * col("total")).cast("int"),
          lit(1)).as("flagged"))
      .orderBy(col("event_type"))
  }

  /** `ts_autocorr` — per-series autocorrelation function at lags 1..7
    * days (the standard seasonality/memory diagnostic that decides
    * whether B83's weekly decomposition is even the right model: a
    * spike at lag 7 says weekly, fast decay says noise): for each
    * event type's daily revenue-cents series, ACF(L) = Σ (x_t − x̄)
    * (x_{t+L} − x̄) / Σ (x_t − x̄)² where the lag is CALENDAR days
    * (pairs join on epoch-day + L, so a gappy series never
    * misaligns — the jittered-series convention).
    *
    * Cross-engine exact by scaled-integer centering: z = n·x − S is
    * pure BIGINT (no float mean enters), products z·z accumulate in
    * decimal(38,0) / HUGEINT (z ~ 1e12 at sf0.1 → z² ~ 1e24, far past
    * 2^63 but exact in 38 digits — ts_changepoint's precedent), and
    * the single float op is one IEEE division of two exactly-rounded
    * doubles, round-6 guarded (C29's rule). Scale shape: ONE
    * map-side-combined fact shuffle to the O(types × days) daily
    * frame; the 7-lag fan-out and self-join run on that collapsed
    * frame (B31's collapse-the-stream-first rule), output O(types×7).
    */
  def tsAutocorr(spark: SparkSession, dir: String): DataFrame =
    tsAutocorrOf(Tables(spark, dir, "events"))

  /** [[tsAutocorr]]'s kernel on any events-shaped frame. */
  def tsAutocorrOf(events: DataFrame): DataFrame =
    autocorr(events, maxLag = 7)

  /** [[tsAutocorr]]'s kernel on any (event_type, ts, value) frame. */
  private[operators] def autocorr(events: DataFrame, maxLag: Int)
      : DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")) * 100, 0).cast("long").as("cents"))
      .withColumn("dn", datediff(col("day"), lit("1970-01-01")))
    val tot = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    // z = n·cents − S: the mean removed WITHOUT a division (scaled by
    // n) — BIGINT-exact, identical on both engines
    val z = daily.join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("dn"),
        (col("n") * col("cents") - col("s")).as("z"))
    val den = z.groupBy(col("event_type"))
      .agg(sum(col("z").cast("decimal(38,0)") * col("z")).as("den"))
    val lagged = z.crossJoin(
        events.sparkSession.range(1, maxLag + 1)
          .select(col("id").cast("int").as("lag")))
      .select(col("event_type"), col("lag"),
        (col("dn") + col("lag")).as("dn"), col("z").as("zb"))
    val num = z.join(lagged, Seq("event_type", "dn"))
      .groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("z").cast("decimal(38,0)") * col("zb")).as("num"))
    num.join(broadcast(den), Seq("event_type"))
      .filter(col("den") > 0)
      .select(col("event_type"), col("lag"), col("n_pairs"),
        round(col("num").cast("double") / col("den").cast("double"), 6)
          .as("acf"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** `graph_pagerank` — iterative graph analytics expressed
    * declaratively: PageRank (d = 0.85, 3 power iterations, dangling
    * mass redistributed uniformly) over the nation-level trade network
    * (edge cust_nation → supp_nation weighted by lineitem count). The
    * scale split is explicit: the ONE heavy pass is the edge
    * aggregation (fact joins → an O(nations²) edge list); the
    * iterations run on frontier frames of O(nodes) rows joined against
    * the broadcast transition matrix — the loop unrolls into a single
    * Catalyst plan with no driver-side collect per step, and
    * per-iteration cost is independent of fact-table size. Constants
    * are spelled as the same literals in both engines (never 1−d:
    * 1−0.85 ≠ literal-0.15 in doubles).
    */
  def graphPagerank(spark: SparkSession, dir: String): DataFrame =
    graphPagerankOf(Tables(spark, dir, "nation"),
      Tables(spark, dir, "lineitem"), Tables(spark, dir, "orders"),
      Tables(spark, dir, "customer"), Tables(spark, dir, "supplier"))

  /** [[graphPagerank]]'s kernel on the five caller frames. */
  def graphPagerankOf(nationTbl: DataFrame, li: DataFrame,
      ord: DataFrame, cust: DataFrame, sup: DataFrame): DataFrame = {
    val spark = nationTbl.sparkSession
    val nation = nationTbl
      .select(col("n_nationkey").as("node"), col("n_name"))
    val nC = nationTbl.count().toDouble
    val edges = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .filter(cust("c_nationkey") =!= sup("s_nationkey"))
      .groupBy(cust("c_nationkey").as("src"), sup("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val wout = Window.partitionBy(col("src"))
    // materialize the O(nations²) transition matrix to the driver (the
    // k-means pattern, see refinedCentroids): every unrolled iteration
    // reads it, and as a live plan each read would replay the
    // fact-scale edge aggregation subtree — as a local relation the
    // iterations never touch the fact tables
    import spark.implicits._
    val transLocal = edges
      .withColumn("p", col("w") * lit(1.0) / sum(col("w")).over(wout))
      .select(col("src"), col("dst"), col("p"))
      .as[(Int, Int, Double)].collect().toSeq.sortBy(t => (t._1, t._2))
    val trans = transLocal.toDF("src", "dst", "p")
    val srcs = trans.select(col("src")).distinct()
    var pr = nation.select(col("node")).withColumn("pr", lit(1.0 / nC))
    for (_ <- 1 to 3) {
      val contrib = pr.join(broadcast(trans), col("node") === col("src"))
        .groupBy(col("dst")).agg(sum(col("pr") * col("p")).as("c"))
      val dang = pr
        .join(broadcast(srcs), pr("node") === srcs("src"), "left_anti")
        .agg(coalesce(sum(col("pr")), lit(0.0)).as("dang"))
      pr = nation.select(col("node"))
        .join(contrib, col("node") === col("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          (lit(0.15) / nC + lit(0.85) *
            (coalesce(col("c"), lit(0.0)) + col("dang") / nC)).as("pr"))
    }
    val wr = Window.orderBy(col("pagerank").desc, col("n_name"))
    pr.join(broadcast(nation), Seq("node"))
      .select(col("n_name"), round(col("pr"), 6).as("pagerank"))
      .withColumn("rank", row_number().over(wr))
      .orderBy(col("rank"))
  }

  /** `orders_open_by_day` — temporal state counting ("how many orders
    * were in flight on each date") by SWEEP-LINE, not interval
    * explosion: each order contributes a +1 at its open date and a −1
    * the day after its last shipment, the deltas aggregate to one row
    * per distinct date, and a running sum over that O(dates) frame
    * recovers the concurrent-open count at every change point. The
    * naive spelling explodes span-length rows per order (unbounded at
    * 100 TB — a year-open order is 365 rows); the sweep is exactly two
    * rows per order regardless of span, and the only window runs over
    * the pre-aggregated calendar frame (the documented tiny-frame
    * global window).
    */
  def ordersOpenByDay(spark: SparkSession, dir: String): DataFrame =
    ordersOpenByDayOf(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"))

  /** [[ordersOpenByDay]]'s kernel on caller lineitem/orders frames. */
  def ordersOpenByDayOf(lineitem: DataFrame,
      orders: DataFrame): DataFrame = {
    val close = lineitem
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("close_day"))
    val spans = orders
      .join(close, col("o_orderkey") === col("l_orderkey"), "left")
      .select(to_date(col("o_orderdate")).as("open_day"),
        greatest(coalesce(col("close_day"), to_date(col("o_orderdate"))),
          to_date(col("o_orderdate"))).as("close_day"))
    val deltas = spans.select(col("open_day").as("day"), lit(1L).as("d"))
      .unionAll(spans.select(date_add(col("close_day"), 1).as("day"),
        lit(-1L).as("d")))
      .groupBy(col("day")).agg(sum(col("d")).as("delta"))
    deltas
      .withColumn("n_open",
        sum(col("delta")).over(Window.orderBy(col("day"))))
      .orderBy(col("day"))
  }

  /** B83 `ts_seasonal` — classical additive seasonal decomposition of
    * the daily revenue series per event type (trend + weekday effect +
    * residual; the moving-average decomposition STL descends from):
    * trend = centered 7-day moving average (null on the 3-day edges —
    * a partial window is a biased trend, so it's reported as missing,
    * not faked), seasonal = per-weekday mean of the detrended series,
    * residual = observed − trend − seasonal. A "full" window needs
    * BOTH cnt7 == 7 and a 6-day calendar span — on a series with
    * missing days a 7-ROW frame can straddle more than 7 days, which
    * silently breaks the weekday-cancellation premise the seasonal
    * estimate rests on (and both engines would agree on the biased
    * number, so only the guard catches it). Days whose weekday never
    * appears in any full window (series shorter than ~10 days per
    * type) are still REPORTED — the seasonal join is left-outer, so
    * they carry null seasonal/resid instead of vanishing. Everything
    * windows over the O(types × days) DAILY frame — the B31 rule:
    * collapse the stream first, decompose the tiny series after, so
    * the pattern costs one map-side-combined shuffle at any event
    * volume. Exact
    * cross-engine: cents are integer, the centered sum and the
    * detrended values 7·c − Σ₇ are pure BIGINT (no float mean enters
    * the pipeline until the final reported divisions, which both
    * engines perform on identical exact inputs), and the residual
    * subtracts the ROUNDED reported trend/seasonal so the last float
    * op is bit-identical too.
    */
  def tsSeasonal(spark: SparkSession, dir: String): DataFrame =
    tsSeasonalOf(Tables(spark, dir, "events"))

  /** [[tsSeasonal]]'s kernel on any events-shaped frame. */
  def tsSeasonalOf(events: DataFrame): DataFrame =
    seasonalDecompose(events)

  /** [[tsSeasonal]]'s kernel on any events frame. */
  private[operators] def seasonalDecompose(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")) * 100, 0).cast("long").as("cents"))
    val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val w = daily
      .withColumn("sum7", sum(col("cents")).over(w7))
      .withColumn("cnt7", count(lit(1)).over(w7))
      // integer-exact gap guard: 7 rows AND a 6-day span, else the
      // frame silently covers >7 calendar days on a gappy series
      .withColumn("full7", col("cnt7") === 7 &&
        datediff(max(col("day")).over(w7), min(col("day")).over(w7)) === 6)
      .withColumn("dow", expr("weekday(day) + 1"))
    val seas = w.filter(col("full7"))
      .select(col("event_type"), col("dow"),
        (lit(7) * col("cents") - col("sum7")).as("d7"))
      .groupBy(col("event_type"), col("dow"))
      .agg(sum(col("d7")).as("s_sum"), count(lit(1)).as("s_n"))
    w.join(broadcast(seas), Seq("event_type", "dow"), "left")
      .withColumn("trend",
        when(col("full7"), round(col("sum7") / 700.0, 4)))
      .withColumn("seasonal",
        round(col("s_sum") / (col("s_n") * lit(700.0)), 4))
      .select(col("event_type"), col("day"), col("dow"),
        (col("cents") / 100.0).as("rev"), col("trend"), col("seasonal"),
        when(col("full7"),
          round(col("cents") / 100.0 - col("trend") - col("seasonal"), 4))
          .as("resid"))
      .orderBy(col("event_type"), col("day"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_seasonal" -> (tsSeasonal _),
    "orders_open_by_day" -> (ordersOpenByDay _),
    "graph_pagerank" -> (graphPagerank _),
    "agg_hist_quantiles" -> (aggHistQuantiles _),
    "win_distribution" -> (winDistribution _),
    "abc_pareto" -> (abcPareto _),
    "events_cooccur" -> (eventsCooccur _),
    "ts_ewma" -> (tsEwma _),
    "ts_holt" -> (tsHolt _),
    "ts_backtest" -> (tsBacktest _),
    "ts_changepoint" -> (tsChangepoint _),
    "ts_autocorr" -> (tsAutocorr _),
    "ts_gapfill" -> (tsGapfill _),
    "robust_stats" -> (robustStats _),
    "corr_stats" -> (corrStats _),
    "regr_trend" -> (regrTrend _),
    "events_markov" -> (eventsMarkov _),
    "orders_rfm" -> (ordersRfm _),
    "cohort_ltv" -> (cohortLtv _),
    "agg_exact_median" -> (aggExactMedian _),
    "events_streaks" -> (eventsStreaks _),
    "q6_revenue" -> (q6Revenue _),
    "q4_priority" -> (q4Priority _),
    "q10_returns" -> (q10Returns _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q14_promo" -> (q14Promo _),
    "win_first_last" -> (winFirstLast _),
    "sample_pergroup" -> (samplePergroup _)
  )

  /** The ts_holt oracle's fold body, composed here because the new
    * level appears inside the trend update and every /10 must be the
    * floor spelling — expanding by hand invites the exact off-by-one
    * this replaces.
    */
  private val tsHoltOracle: String = {
    val S = "10000000000"
    val O = "5000000000"
    def lfloor(n: String) = s"(($n) - ((($n) % 10 + 10) % 10)) // 10"
    // the unpack must ALSO be floor-consistent: a sharp enough dip can
    // drive the level itself negative (packed < 0), where DuckDB's
    // truncating // and sign-of-dividend % would unpack garbage
    def unpackMod(a: String) = s"((($a) % $S + $S) % $S)"
    def unpackDiv(a: String) = s"((($a) - ${unpackMod(a)}) // $S)"
    val l = unpackDiv("a")
    val t = s"(${unpackMod("a")} - $O)"
    val l2 = lfloor(s"5 * x + 5 * ($l + $t)")
    val t2 = lfloor(s"3 * (($l2) - $l) + 7 * $t")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |    CAST(round(sum(value) * 100, 0) AS BIGINT) AS cents
       |  FROM events GROUP BY 1, 2),
       |ser AS (SELECT event_type,
       |    array_agg(CAST(cents AS HUGEINT) ORDER BY day) AS cs,
       |    array_agg(day ORDER BY day) AS days
       |  FROM daily GROUP BY event_type),
       |idx AS (SELECT event_type, cs, days,
       |    unnest(range(1, len(cs) + 1)) AS i
       |  FROM ser),
       |st AS (SELECT event_type, days, cs, i,
       |    list_reduce(
       |      list_prepend(cs[1] * $S + $O, cs[2:i]),
       |      (a, x) -> ($l2) * $S + ($t2) + $O) AS packed
       |  FROM idx)
       |SELECT event_type, days[i] AS day, cs[i] / 100.0 AS rev,
       |  ${unpackDiv("packed")} / 100.0 AS level,
       |  (${unpackMod("packed")} - $O) / 100.0 AS trend,
       |  (${unpackDiv("packed")}
       |    + (${unpackMod("packed")} - $O)) / 100.0 AS forecast_next
       |FROM st ORDER BY event_type, day""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // ts_seasonal: isodow == Spark's weekday()+1 (Monday=1); the
    // residual subtracts the rounded reported components, so the one
    // float chain is identical on both engines
    "ts_seasonal" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(round(sum(value) * 100, 0) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT *, sum(cents) OVER f AS sum7, count(*) OVER f AS cnt7,
        |    (count(*) OVER f = 7 AND date_diff('day',
        |      min(day) OVER f, max(day) OVER f) = 6) AS full7,
        |    isodow(day) AS dow
        |  FROM daily WINDOW f AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |seas AS (SELECT event_type, dow,
        |    CAST(sum(7 * cents - sum7) AS BIGINT) AS s_sum,
        |    count(*) AS s_n
        |  FROM w WHERE full7 GROUP BY 1, 2)
        |SELECT w.event_type, w.day, CAST(w.dow AS INT) AS dow,
        |  w.cents / 100.0 AS rev,
        |  CASE WHEN w.full7 THEN round(w.sum7 / 700.0, 4) END AS trend,
        |  round(s.s_sum / (s.s_n * 700.0), 4) AS seasonal,
        |  CASE WHEN w.full7 THEN round(w.cents / 100.0
        |    - round(w.sum7 / 700.0, 4)
        |    - round(s.s_sum / (s.s_n * 700.0), 4), 4) END AS resid
        |FROM w LEFT JOIN seas s ON s.event_type = w.event_type
        |  AND s.dow = w.dow
        |ORDER BY w.event_type, w.day""".stripMargin,
    "orders_open_by_day" ->
      """WITH cl AS (SELECT l_orderkey,
        |    max(CAST(l_shipdate AS DATE)) AS close_day
        |  FROM lineitem GROUP BY l_orderkey),
        |sp AS (SELECT CAST(o.o_orderdate AS DATE) AS open_day,
        |    greatest(coalesce(cl.close_day, CAST(o.o_orderdate AS DATE)),
        |      CAST(o.o_orderdate AS DATE)) AS close_day
        |  FROM orders o LEFT JOIN cl ON o.o_orderkey = cl.l_orderkey),
        |dl AS (SELECT day, CAST(sum(d) AS BIGINT) AS delta FROM (
        |    SELECT open_day AS day, 1 AS d FROM sp
        |    UNION ALL
        |    SELECT close_day + INTERVAL 1 DAY, -1 FROM sp)
        |  GROUP BY day)
        |SELECT CAST(day AS DATE) AS day, delta,
        |  CAST(sum(delta) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_open
        |FROM dl ORDER BY day""".stripMargin,
    // graph_pagerank: the unrolled 3-iteration replay; rank jitter from
    // cross-engine double-sum order is absorbed by the 6-dp round, and
    // the damping constants are the same literals as the Spark side
    "graph_pagerank" ->
      """WITH e0 AS MATERIALIZED (SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
        |    count(*) AS w
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  WHERE c.c_nationkey <> s.s_nationkey
        |  GROUP BY 1, 2),
        |t AS MATERIALIZED (SELECT src, dst,
        |    w * 1.0 / sum(w) OVER (PARTITION BY src) AS p
        |  FROM e0),
        |n AS (SELECT n_nationkey AS node, n_name FROM nation),
        |nn AS (SELECT count(*) * 1.0 AS cnt FROM n),
        |p0 AS MATERIALIZED (SELECT node, 1.0 / cnt AS pr FROM n CROSS JOIN nn),
        |c1 AS (SELECT t.dst AS node, sum(p0.pr * t.p) AS c
        |  FROM p0 JOIN t ON p0.node = t.src GROUP BY t.dst),
        |d1 AS (SELECT coalesce(sum(pr), 0.0) AS dang FROM p0
        |  WHERE node NOT IN (SELECT DISTINCT src FROM t)),
        |p1 AS MATERIALIZED (SELECT n.node,
        |    0.15 / cnt + 0.85 * (coalesce(c1.c, 0.0) + d1.dang / cnt) AS pr
        |  FROM n CROSS JOIN nn CROSS JOIN d1
        |  LEFT JOIN c1 ON c1.node = n.node),
        |c2 AS (SELECT t.dst AS node, sum(p1.pr * t.p) AS c
        |  FROM p1 JOIN t ON p1.node = t.src GROUP BY t.dst),
        |d2 AS (SELECT coalesce(sum(pr), 0.0) AS dang FROM p1
        |  WHERE node NOT IN (SELECT DISTINCT src FROM t)),
        |p2 AS MATERIALIZED (SELECT n.node,
        |    0.15 / cnt + 0.85 * (coalesce(c2.c, 0.0) + d2.dang / cnt) AS pr
        |  FROM n CROSS JOIN nn CROSS JOIN d2
        |  LEFT JOIN c2 ON c2.node = n.node),
        |c3 AS (SELECT t.dst AS node, sum(p2.pr * t.p) AS c
        |  FROM p2 JOIN t ON p2.node = t.src GROUP BY t.dst),
        |d3 AS (SELECT coalesce(sum(pr), 0.0) AS dang FROM p2
        |  WHERE node NOT IN (SELECT DISTINCT src FROM t)),
        |p3 AS (SELECT n.node,
        |    0.15 / cnt + 0.85 * (coalesce(c3.c, 0.0) + d3.dang / cnt) AS pr
        |  FROM n CROSS JOIN nn CROSS JOIN d3
        |  LEFT JOIN c3 ON c3.node = n.node)
        |SELECT nm.n_name, round(p3.pr, 6) AS pagerank,
        |  row_number() OVER (ORDER BY round(p3.pr, 6) DESC, nm.n_name)
        |    AS rank
        |FROM p3 JOIN n nm USING (node)
        |ORDER BY rank""".stripMargin,
    // ts_ewma: the fixed-point fold replays as an ordered list_reduce
    // over bigint cents — // is floor division like Spark's div on the
    // all-positive revenue series, so every step is exactly equal; the
    // only doubles are the final /100.0 displays of exact integers
    "ts_ewma" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(round(sum(value) * 100, 0) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |ser AS (SELECT event_type,
        |    array_agg(cents ORDER BY day) AS cs,
        |    array_agg(day ORDER BY day) AS days
        |  FROM daily GROUP BY event_type),
        |idx AS (SELECT event_type, cs, days,
        |    unnest(range(1, len(cs) + 1)) AS i
        |  FROM ser)
        |SELECT event_type, days[i] AS day, cs[i] / 100.0 AS rev,
        |  list_reduce(cs[1:i], (a, x) -> (3 * x + 7 * a) // 10) / 100.0
        |    AS ewma
        |FROM idx ORDER BY event_type, day""".stripMargin,
    // ts_holt: the two-state fold replays as a list_reduce whose
    // accumulator packs (level, trend) into one HUGEINT — DuckDB's
    // list_reduce fixes acc type = element type, so the series is cast
    // to HUGEINT and the packed init is prepended (level·1e10 + trend
    // + 5e9). DuckDB's integer // TRUNCATES toward zero, so each /10
    // step spells the TRUE floor ((n − pmod(n,10)) // 10, with pmod as
    // ((n%10+10)%10)) — matching Spark's pmod-floor exactly on the
    // negative numerators a dipping trend produces. The packed acc
    // itself stays ≥ 0 (positive-revenue level, |trend| < 5e9), so the
    // unpack's plain // and % are exact.
    "ts_holt" -> tsHoltOracle,
    // ts_backtest: the Holt replay as a derived table, integer cents
    // reconstructed, lead window + rollup; signed total error stays a
    // plain sum (negative floor division differs across engines)
    "ts_backtest" ->
      s"""WITH h AS (SELECT event_type, day,
         |    CAST(round(rev * 100) AS BIGINT) AS rev_cents,
         |    CAST(round(forecast_next * 100) AS BIGINT) AS fc
         |  FROM (${tsHoltOracle})),
         |l AS (SELECT *, lead(rev_cents) OVER (
         |    PARTITION BY event_type ORDER BY day) AS next_rev FROM h),
         |f AS (SELECT * FROM l WHERE next_rev IS NOT NULL)
         |SELECT event_type, count(*) AS n_evals,
         |  CAST(sum(abs(next_rev - fc)) // count(*) AS BIGINT)
         |    AS mae_holt_cents,
         |  CAST(sum(abs(next_rev - rev_cents)) // count(*) AS BIGINT)
         |    AS mae_naive_cents,
         |  CAST(sum(next_rev - fc) AS BIGINT) AS err_total_cents,
         |  CAST(CAST(sum(abs(next_rev - fc)) // count(*) AS BIGINT)
         |    <= CAST(sum(abs(next_rev - rev_cents)) // count(*) AS BIGINT)
         |    AS INT) AS holt_wins
         |FROM f GROUP BY event_type ORDER BY event_type""".stripMargin,
    // ts_changepoint: integer scaled-CUSUM replay — window cumsum,
    // argmax on (|nS| desc, position asc), squared 3σ bar in HUGEINT
    "ts_changepoint" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS n FROM events GROUP BY 1, 2),
        |tot AS (SELECT event_type, count(*) AS n_days,
        |    CAST(sum(n) AS BIGINT) AS total FROM daily GROUP BY 1),
        |cum AS (SELECT event_type, day,
        |    CAST(row_number() OVER w AS INT) AS p,
        |    CAST(sum(n) OVER w AS BIGINT) AS cum
        |  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |ns AS (SELECT c.event_type, c.day, c.p, t.n_days, t.total,
        |    abs(t.n_days * c.cum - c.p * t.total) AS a
        |  FROM cum c JOIN tot t USING (event_type)
        |  WHERE c.p < t.n_days),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY a DESC, p ASC) AS rn FROM ns)
        |SELECT event_type, n_days, total, day AS cp_day, a AS stat,
        |  CAST(4 * CAST(a AS HUGEINT) * a >
        |    9 * CAST(n_days AS HUGEINT) * n_days * total AS INT)
        |    AS flagged
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    // ts_autocorr: scaled-integer centering (z = n·x − S, BIGINT),
    // HUGEINT product sums, one round-6 IEEE division at the end;
    // calendar-day lag join replayed 1:1
    "ts_autocorr" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(round(sum(value) * 100, 0) AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |d2 AS (SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', day) AS dn, cents
        |  FROM daily),
        |tot AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS s FROM d2 GROUP BY 1),
        |z AS (SELECT d.event_type, d.dn, t.n * d.cents - t.s AS z
        |  FROM d2 d JOIN tot t USING (event_type)),
        |den AS (SELECT event_type, sum(CAST(z AS HUGEINT) * z) AS den
        |  FROM z GROUP BY 1),
        |lags AS (SELECT CAST(unnest(generate_series(1, 7)) AS INT)
        |    AS lag),
        |num AS (SELECT a.event_type, l.lag,
        |    CAST(count(*) AS BIGINT) AS n_pairs,
        |    sum(CAST(a.z AS HUGEINT) * b.z) AS num
        |  FROM z a CROSS JOIN lags l
        |  JOIN z b ON b.event_type = a.event_type
        |    AND b.dn = a.dn + l.lag
        |  GROUP BY 1, 2)
        |SELECT n.event_type, n.lag, n.n_pairs,
        |  round(CAST(n.num AS DOUBLE) / CAST(d.den AS DOUBLE), 6)
        |    AS acf
        |FROM num n JOIN den d USING (event_type) WHERE d.den > 0
        |ORDER BY n.event_type, n.lag""".stripMargin,
    "agg_hist_quantiles" ->
      """WITH partials AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(least(floor(value / 8), 127) AS BIGINT) AS bucket,
        |    count(*) AS pn
        |  FROM events GROUP BY 1, 2, 3),
        |merged AS (
        |  SELECT event_type, bucket, sum(pn) AS n
        |  FROM partials GROUP BY 1, 2),
        |cum AS (
        |  SELECT *,
        |    sum(n) OVER (PARTITION BY event_type ORDER BY bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(n) OVER (PARTITION BY event_type) AS total
        |  FROM merged),
        |p50 AS (
        |  SELECT event_type, round(min_by(bucket, bucket) * 8
        |      + 8 * (min_by(total, bucket) * CAST(0.5 AS DOUBLE)
        |        - (min_by(cum, bucket) - min_by(n, bucket)))
        |        / min_by(n, bucket), 4) AS p50_approx
        |  FROM cum WHERE cum >= total * CAST(0.5 AS DOUBLE) GROUP BY 1),
        |p95 AS (
        |  SELECT event_type, round(min_by(bucket, bucket) * 8
        |      + 8 * (min_by(total, bucket) * CAST(0.95 AS DOUBLE)
        |        - (min_by(cum, bucket) - min_by(n, bucket)))
        |        / min_by(n, bucket), 4) AS p95_approx
        |  FROM cum WHERE cum >= total * CAST(0.95 AS DOUBLE) GROUP BY 1)
        |SELECT t.event_type, t.n_events, p50.p50_approx, p95.p95_approx
        |FROM (SELECT event_type, CAST(max(total) AS BIGINT) AS n_events
        |      FROM cum GROUP BY 1) t
        |JOIN p50 USING (event_type)
        |JOIN p95 USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "win_distribution" ->
      """WITH totals AS (
        |  SELECT o_orderpriority, o_custkey,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total_d
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderpriority, o_custkey,
        |  CAST(round(total_d, 2) AS DOUBLE) AS total_spend,
        |  percent_rank() OVER (PARTITION BY o_orderpriority
        |    ORDER BY total_d) AS pct_rank,
        |  cume_dist() OVER (PARTITION BY o_orderpriority
        |    ORDER BY total_d) AS cume
        |FROM totals
        |ORDER BY o_orderpriority, o_custkey""".stripMargin,
    "abc_pareto" ->
      """WITH per_part AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))) AS rev_d
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(rev_d) AS total_d FROM per_part),
        |r AS (
        |  SELECT l_partkey, rev_d,
        |    round(CAST(sum(rev_d) OVER (
        |      ORDER BY rev_d DESC, l_partkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |      / CAST(total_d AS DOUBLE), 6) AS run_share
        |  FROM per_part CROSS JOIN t)
        |SELECT l_partkey AS p_partkey,
        |  CAST(round(rev_d, 2) AS DOUBLE) AS revenue, run_share,
        |  CASE WHEN run_share <= 0.5 THEN 'A'
        |    WHEN run_share <= 0.8 THEN 'B' ELSE 'C' END AS abc_class
        |FROM r ORDER BY run_share, p_partkey""".stripMargin,
    "events_cooccur" ->
      """WITH baskets AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
        |  FROM events),
        |per_type AS (
        |  SELECT event_type, count(*) AS n_type FROM baskets GROUP BY 1),
        |n AS (
        |  SELECT count(*) AS n_baskets FROM (
        |    SELECT DISTINCT user_id, day FROM baskets)),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |    count(*) AS n_both
        |  FROM baskets a JOIN baskets b
        |    ON a.user_id = b.user_id AND a.day = b.day
        |    AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, n_both, pa.n_type AS n_a, pb.n_type AS n_b,
        |  round(CAST(n_both AS DOUBLE) * n_baskets
        |    / (pa.n_type * pb.n_type), 6) AS lift
        |FROM pairs
        |JOIN per_type pa ON pairs.type_a = pa.event_type
        |JOIN per_type pb ON pairs.type_b = pb.event_type
        |CROSS JOIN n
        |ORDER BY type_a, type_b""".stripMargin,
    "ts_gapfill" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
        |    round(sum(value), 2) AS v
        |  FROM events WHERE value >= 200.0 GROUP BY 1, 2),
        |span AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
        |cal AS (
        |  SELECT event_type,
        |    CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
        |      AS day
        |  FROM (SELECT DISTINCT event_type FROM daily), span)
        |SELECT event_type, day,
        |  coalesce(n, 0) AS n_events,
        |  CAST(CASE WHEN n IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap,
        |  round(coalesce(last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0), 2)
        |    AS filled_value
        |FROM cal LEFT JOIN daily USING (event_type, day)
        |ORDER BY event_type, day""".stripMargin,
    "robust_stats" ->
      """WITH m AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med_raw,
        |    quantile_cont(value, 0.25) AS p25,
        |    quantile_cont(value, 0.75) AS p75
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, count(*) AS n_events,
        |  round(max(m.med_raw), 4) AS med,
        |  round(quantile_cont(abs(e.value - m.med_raw), 0.5), 4) AS mad,
        |  round(max(m.p75) - max(m.p25), 4) AS iqr
        |FROM events e JOIN m USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "corr_stats" ->
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        |  round(covar_samp(l_quantity, l_extendedprice), 2)
        |    AS qty_price_covar,
        |  round(stddev_samp(l_quantity), 6) AS qty_stddev,
        |  round(stddev_samp(l_extendedprice), 2) AS price_stddev,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "regr_trend" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0 AS rev
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |  round(regr_slope(rev,
        |    CAST(datediff('day', DATE '1997-01-01', day) AS DOUBLE)), 4)
        |    AS slope,
        |  round(regr_intercept(rev,
        |    CAST(datediff('day', DATE '1997-01-01', day) AS DOUBLE)), 2)
        |    AS intercept,
        |  count(*) AS n_days
        |FROM daily GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_markov" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events),
        |trans AS (
        |  SELECT prev, event_type AS curr, count(*) AS n
        |  FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type)
        |SELECT prev, curr, n,
        |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev), 4) AS p
        |FROM trans ORDER BY prev, curr""".stripMargin,
    // B88: the oracle is the NAIVE order-statistic definition (full
    // per-group sort) — the bucketed two-phase search must agree with
    // it exactly, which is the whole point
    "agg_exact_median" ->
      """WITH v AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |r AS (SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM v)
        |SELECT event_type, CAST(n AS BIGINT) AS n_events,
        |  CAST((n + 1) // 2 AS BIGINT) AS k, cents AS median_cents
        |FROM r WHERE rn = (n + 1) // 2 ORDER BY event_type""".stripMargin,
    // B89: the classic islands replay — island key ep − row_number,
    // longest ties to earliest start
    "events_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |    FROM events),
        |e AS (SELECT user_id, day,
        |    CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT)
        |      AS ep
        |  FROM d),
        |g AS (SELECT user_id, day, ep,
        |    ep - row_number() OVER (PARTITION BY user_id ORDER BY ep)
        |      AS grp
        |  FROM e),
        |i AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
        |    min(day) AS start_day, min(ep) AS start_ep
        |  FROM g GROUP BY 1, 2),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY len DESC, start_ep ASC) AS rn FROM i),
        |s AS (SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |    CAST(count(*) AS BIGINT) AS n_streaks,
        |    CAST(max(len) AS BIGINT) AS longest_streak
        |  FROM i GROUP BY 1),
        |b AS (SELECT user_id, start_day AS longest_start FROM rk
        |  WHERE rn = 1)
        |SELECT s.user_id, s.n_active_days, s.n_streaks,
        |  s.longest_streak, b.longest_start
        |FROM s JOIN b USING (user_id) ORDER BY s.user_id""".stripMargin,
    // B87: integer month index 12·y+m keeps cohort/age arithmetic
    // exact; cumulative over the collapsed (cohort, age) frame; LTV
    // as floor-division cents
    "cohort_ltv" ->
      """WITH o AS (SELECT o_custkey,
        |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
        |      AS m,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |f AS (SELECT o_custkey, min(m) AS cm FROM o GROUP BY 1),
        |cs AS (SELECT cm, CAST(count(*) AS BIGINT) AS n_customers
        |  FROM f GROUP BY 1),
        |cells AS (SELECT f.cm, o.m - f.cm AS age,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(o.cents) AS BIGINT) AS cents
        |  FROM o JOIN f USING (o_custkey) GROUP BY 1, 2),
        |cum AS (SELECT *, CAST(sum(cents) OVER (PARTITION BY cm
        |    ORDER BY age ROWS BETWEEN UNBOUNDED PRECEDING AND
        |      CURRENT ROW) AS BIGINT) AS cum_cents
        |  FROM cells)
        |SELECT make_date(CAST((cm - 1) // 12 AS INT),
        |    CAST((cm - 1) % 12 + 1 AS INT), 1) AS cohort_month,
        |  age, cs.n_customers, n_orders, cents, cum_cents,
        |  cum_cents // cs.n_customers AS ltv_cents
        |FROM cum JOIN cs USING (cm)
        |ORDER BY cohort_month, age""".stripMargin,
    "orders_rfm" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_order,
        |    count(*) AS frequency,
        |    round(sum(o_totalprice), 2) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |scored AS (
        |  SELECT o_custkey, frequency, monetary,
        |    CAST(datediff('day', last_order,
        |      (SELECT max(o_orderdate) FROM orders)) AS BIGINT) AS recency
        |  FROM per_cust),
        |seg AS (
        |  SELECT recency, frequency, monetary,
        |    ntile(4) OVER (ORDER BY recency, o_custkey) AS r_q,
        |    ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS f_q,
        |    ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_q
        |  FROM scored)
        |SELECT CAST(r_q AS VARCHAR) || CAST(f_q AS VARCHAR)
        |    || CAST(m_q AS VARCHAR) AS segment,
        |  count(*) AS n_customers,
        |  round(avg(recency), 4) AS avg_recency,
        |  round(avg(frequency), 4) AS avg_frequency,
        |  round(avg(monetary), 2) AS avg_monetary
        |FROM seg GROUP BY 1 ORDER BY segment""".stripMargin,
    "q6_revenue" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice * l_discount
        |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS n_lineitems
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1995-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q10_returns" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q7_volume_shipping" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
        |  AND n2.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
        |  AND n1.n_name <> n2.n_name
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q14_promo" ->
      """WITH s AS (SELECT
        |    CAST(round(sum(CASE WHEN p_type LIKE 'PROMO%'
        |      THEN CAST(l_extendedprice * (1 - l_discount)
        |        AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE)
        |      AS promo_revenue,
        |    CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |      AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01')
        |SELECT promo_revenue, total_revenue,
        |  round(100.0 * promo_revenue / total_revenue, 4) AS promo_pct
        |FROM s""".stripMargin,
    "win_first_last" ->
      """SELECT user_id,
        |  round(first_value(value) OVER w, 2) AS first_value,
        |  round(last_value(value) OVER w, 2) AS last_value,
        |  round(nth_value(value, 2) OVER w, 2) AS second_value,
        |  count(*) OVER w AS n_events
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |QUALIFY row_number() OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id) = 1
        |ORDER BY user_id""".stripMargin,
    "sample_pergroup" ->
      """SELECT lang, sample_rank, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |      AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 10
        |ORDER BY lang, sample_rank""".stripMargin
  )
}
