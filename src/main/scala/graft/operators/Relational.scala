package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational analytics operators (SURVEY.md §2.B).
  *
  * Declarative DataFrame plans — Catalyst handles pushdown, pruning and
  * join planning; we pin broadcast/partitioning decisions where the
  * optimizer can't know the data shape.
  */
object Relational {

  /** B1 `q1_agg` — grouped aggregation scan (TPC-H Q1 shape).
    * Single shuffle on low-cardinality keys; partial aggregation
    * (map-side combine) does almost all the work, so this scales
    * linearly with input and the shuffle is tiny.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    q1AggOf(Tables(spark, dir, "lineitem"))

  /** [[q1Agg]]'s kernel on any lineitem-shaped frame. */
  def q1AggOf(li: DataFrame): DataFrame = {
    // Money sums accumulate as EXACT integer cents (r14 sweep — the
    // agg_rollup lesson): these groups span the WHOLE fact table, and
    // a double sum's 2-dp round flips with partial-merge order.
    // sum_qty/avg_qty stay double: l_quantity is integer-valued, and
    // integer-valued doubles sum exactly (order-free) below 2^53.
    // avg_disc divides an exact cent sum once at the end.
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        (sum(round(col("l_extendedprice") * 100, 0).cast("long")) / 100.0)
          .as("sum_base_price"),
        (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100, 0).cast("long")) / 100.0).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(sum(round(col("l_discount") * 100, 0).cast("long"))
          / 100.0 / count(lit(1)), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** B2 `q3_shipping` — 3-way join + agg + deterministic top-N.
    * customer is the small side of the first join; Catalyst broadcasts
    * it under AQE. The lineitem↔orders join shuffles on orderkey — the
    * natural high-cardinality key, so it stays balanced at scale.
    */
  def q3Shipping(spark: SparkSession, dir: String): DataFrame =
    q3ShippingOf(Tables(spark, dir, "customer"),
      Tables(spark, dir, "orders"), Tables(spark, dir, "lineitem"))

  /** [[q3Shipping]]'s kernel on caller customer/orders/lineitem
    * frames.
    */
  def q3ShippingOf(customer: DataFrame, ord: DataFrame,
      li: DataFrame): DataFrame = {
    val cust = customer.filter(col("c_mktsegment") === "BUILDING")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** B3 `q5_local_supplier` — star join: two broadcast dims + three
    * fact-side shuffles keyed on orderkey/custkey/suppkey.
    */
  def q5LocalSupplier(spark: SparkSession, dir: String): DataFrame =
    q5LocalSupplierOf(Tables(spark, dir, "region"),
      Tables(spark, dir, "nation"), Tables(spark, dir, "customer"),
      Tables(spark, dir, "orders"), Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "supplier"))

  /** [[q5LocalSupplier]]'s kernel on the six caller frames. */
  def q5LocalSupplierOf(region0: DataFrame, nation: DataFrame,
      cust: DataFrame, ord0: DataFrame, li: DataFrame,
      sup: DataFrame): DataFrame = {
    val region = region0.filter(col("r_name") === "ASIA")
    val ord = ord0
      .filter(col("o_orderdate") >= lit("1994-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(cust,
        ord("o_custkey") === cust("c_custkey") &&
          sup("s_nationkey") === cust("c_nationkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      // exact integer-cent revenue (r14 sweep): nation groups are
      // fact-scale, so the double sum's round is merge-order dependent
      .agg((sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100, 0).cast("long")) / 100.0).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** B4 `join_broadcast` — explicit dimension broadcast: region→nation
    * hop stays driver-side tiny; only customer shuffles (once, for the
    * final agg — the join itself is map-side).
    */
  def joinBroadcast(spark: SparkSession, dir: String): DataFrame =
    joinBroadcastOf(Tables(spark, dir, "region"),
      Tables(spark, dir, "nation"), Tables(spark, dir, "customer"))

  /** [[joinBroadcast]]'s kernel on caller region/nation/customer. */
  def joinBroadcastOf(region: DataFrame, nation: DataFrame,
      cust: DataFrame): DataFrame = {
    val dim = nation.join(broadcast(region),
      nation("n_regionkey") === region("r_regionkey"))
    cust.join(broadcast(dim), cust("c_nationkey") === dim("n_nationkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("sum_acctbal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** B5 `join_semi` — EXISTS as left-semi: no row multiplication, the
    * probe side streams through the build-side hash set.
    */
  def joinSemi(spark: SparkSession, dir: String): DataFrame =
    joinSemiOf(Tables(spark, dir, "customer"),
      Tables(spark, dir, "orders"))

  /** [[joinSemi]]'s kernel on caller customer/orders. */
  def joinSemiOf(cust: DataFrame, orders: DataFrame): DataFrame = {
    val ord = orders.filter(col("o_totalprice") > 100000.0)
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** B6 `join_anti` — NOT EXISTS as left-anti: the reference's
    * new-vs-yesterday delta (aiesec.py:142) generalized.
    */
  def joinAnti(spark: SparkSession, dir: String): DataFrame =
    joinAntiOf(Tables(spark, dir, "customer"),
      Tables(spark, dir, "orders"))

  /** [[joinAnti]]'s kernel on caller customer/orders. */
  def joinAntiOf(cust: DataFrame, orders: DataFrame): DataFrame = {
    val bigOrders = orders.filter(col("o_totalprice") > 250000.0)
    cust.join(bigOrders, cust("c_custkey") === bigOrders("o_custkey"),
        "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** B7 `agg_rollup` — hierarchy totals in one pass (partial agg per
    * grouping set, single shuffle). Money sums accumulate as EXACT
    * integer cents (r13 — the grand-total row sums the WHOLE fact
    * table, and a double sum's value depends on partial-merge ORDER,
    * which task scheduling makes nondeterministic: the factor-10 gate
    * caught the 2-dp round flipping between runs; §5 determinism
    * lane). Identical integers divide identically in any engine.
    */
  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    aggRollupOf(Tables(spark, dir, "lineitem"))

  /** [[aggRollup]]'s kernel on any lineitem-shaped frame. */
  def aggRollupOf(li: DataFrame): DataFrame =
    li
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(round(col("l_extendedprice") * 100, 0).cast("long")) / 100.0)
          .as("sum_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** B8 `agg_cube` — all grouping-set combinations. Integer-cent sums
    * for the same reason as [[aggRollup]].
    */
  def aggCube(spark: SparkSession, dir: String): DataFrame =
    aggCubeOf(Tables(spark, dir, "orders"))

  /** [[aggCube]]'s kernel on any orders-shaped frame. */
  def aggCubeOf(orders: DataFrame): DataFrame =
    orders
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        (sum(round(col("o_totalprice") * 100, 0).cast("long")) / 100.0)
          .as("sum_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** B12 `agg_distinct` — exact distinct per group: expands to a
    * two-phase aggregate (distinct shuffle then count) under Catalyst.
    */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    aggDistinctOf(Tables(spark, dir, "orders"))

  /** [[aggDistinct]]'s kernel on any orders-shaped frame. */
  def aggDistinctOf(orders: DataFrame): DataFrame =
    orders
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  /** B13 `agg_approx_distinct` — HLL sketch: the 100-TB path for B12
    * (one pass, mergeable KB partials, no distinct shuffle). Uses the
    * deterministic splitmix64 HLL ([[graft.functions.HllOps]]) rather
    * than Spark's HLL++, trading ~1 p.p. of small-range accuracy for a
    * full cross-engine DuckDB oracle (HLL++'s empirical bias tables
    * can't be replayed in SQL); the spec still pins error vs exact.
    */
  def aggApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    aggApproxDistinctOf(Tables(spark, dir, "lineitem"))

  /** [[aggApproxDistinct]]'s kernel on any lineitem-shaped frame. */
  def aggApproxDistinctOf(li: DataFrame): DataFrame = {
    import graft.functions.HllSketch._
    li
      .groupBy(col("l_returnflag"))
      .agg(
        hllEstimate(hllAgg(col("l_partkey"))).as("approx_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** `set_ops` — UNION/INTERSECT/EXCEPT with SQL set semantics
    * (deduplicating), tagged per source: high-balance vs BUILDING
    * customers. Each set op is a shuffle on the full row; Catalyst
    * plans INTERSECT/EXCEPT as left-semi/anti under the hood, so the
    * scalable join machinery applies unchanged.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame =
    setOpsOf(Tables(spark, dir, "customer"))

  /** [[setOps]]'s kernel on any customer-shaped frame. */
  def setOpsOf(cust: DataFrame): DataFrame = {
    val rich = cust.filter(col("c_acctbal") > 5000)
      .select(col("c_custkey"), col("c_name"))
    val building = cust.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    rich.union(building).distinct().withColumn("tag", lit("union"))
      .unionByName(rich.intersect(building).withColumn("tag", lit("both")))
      .unionByName(rich.except(building).withColumn("tag", lit("rich_only")))
      .orderBy(col("tag"), col("c_custkey"))
  }

  /** `q18_large_orders` — TPC-H Q18 shape: aggregate-then-semi-join.
    * The HAVING set is fact-derived, so its cardinality grows with SF —
    * a hard `broadcast()` hint here would force millions of keys into
    * every executor at 100 TB (broadcast-OOM). No hint: AQE sees the
    * runtime size of the aggregate and picks broadcast when it IS small
    * (it is at test SFs) and shuffle join when it isn't. The heavy work
    * stays one partial-aggregated groupBy on the natural key either way.
    */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame =
    q18LargeOrdersOf(Tables(spark, dir, "lineitem"),
      Tables(spark, dir, "orders"))

  /** [[q18LargeOrders]]'s kernel on caller lineitem/orders. */
  def q18LargeOrdersOf(li: DataFrame, ord: DataFrame): DataFrame = {
    val bigKeys = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 300)
    ord.join(bigKeys, ord("o_orderkey") === bigKeys("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        round(col("total_qty"), 2).as("total_qty"))
      .orderBy(col("o_orderkey"))
  }

  /** `unpivot_metrics` — wide→long melt (the inverse of B15's pivot)
    * via `stack`: one row per (group, metric). stack is a Generate —
    * map-only, no shuffle beyond the source aggregation — where the
    * naive spelling (one UNION ALL branch per metric, as the oracle
    * does) would rescan the aggregate per metric. Long form is what
    * metric stores and plotting layers ingest.
    */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    unpivotMetricsOf(Tables(spark, dir, "lineitem"))

  /** [[unpivotMetrics]]'s kernel on any lineitem-shaped frame. */
  def unpivotMetricsOf(li: DataFrame): DataFrame =
    li
      .groupBy(col("l_returnflag"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        // exact integer cents (r14 sweep): whole-table-scale groups
        (sum(round(col("l_extendedprice") * 100, 0).cast("long")) / 100.0)
          .as("sum_base_price"),
        count(lit(1)).cast("double").as("n_rows"))
      .select(col("l_returnflag"), expr(
        """stack(3,
          |  'n_rows', n_rows,
          |  'sum_base_price', sum_base_price,
          |  'sum_qty', sum_qty) AS (metric, value)""".stripMargin))
      .orderBy(col("l_returnflag"), col("metric"))

  /** `agg_hll_partial` — sketch-table maintenance: per-(type, day)
    * HLL register partials, then a union-merge per type answers
    * "distinct users over the whole range" WITHOUT revisiting events.
    * This is the incremental form of agg_approx_distinct: at 100 TB the
    * daily sketch table is the only thing ever recomputed (one new day,
    * ~KB per group), and any time-range rollup is a merge of stored
    * binaries — the archive is never rescanned. Register max is
    * associative, so the DuckDB oracle verifies the merged estimate
    * exactly by sketching each whole group; merge ≡ direct and ±5%
    * accuracy are additionally pinned in spec.
    */
  def aggHllPartial(spark: SparkSession, dir: String): DataFrame =
    aggHllPartialOf(Tables(spark, dir, "events"))

  /** [[aggHllPartial]]'s kernel on any events-shaped frame. */
  def aggHllPartialOf(events: DataFrame): DataFrame = {
    import graft.functions.HllSketch._
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hllAgg(col("user_id")).as("sk")) // the stored partial
    daily
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        hllEstimate(hllMerge(col("sk"))).as("approx_users"))
      .orderBy(col("event_type"))
  }

  /** `hll_overlap` — sketch ALGEBRA over the B35 sketch table:
    * audience overlap |A ∩ B| between two event types by
    * inclusion–exclusion (|A| + |B| − |A ∪ B|), where |A ∪ B| is just
    * the register-max merge of the SAME stored daily partials — no
    * revisit of raw events, no exact-distinct shuffle of user ids.
    * This is the query shape sketch tables exist for: any pairwise
    * (or k-way, by the same algebra) audience question answered from
    * KB-sized stored state. Estimates are the deterministic HLL's, so
    * the oracle replays all three exactly; the ±error bound on the
    * derived overlap (3 estimates' errors compound) is pinned in spec
    * against the exact intersection.
    */
  def hllOverlap(spark: SparkSession, dir: String): DataFrame =
    hllOverlapOf(Tables(spark, dir, "events"))

  /** [[hllOverlap]]'s kernel on any events-shaped frame. */
  def hllOverlapOf(events: DataFrame): DataFrame = {
    import graft.functions.HllSketch._
    val (ta, tb) = ("view", "purchase")
    val daily = events
      .filter(col("event_type").isin(ta, tb))
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hllAgg(col("user_id")).as("sk"))
    val perType = daily.groupBy(col("event_type"))
      .agg(hllEstimate(hllMerge(col("sk"))).as("est"))
    val union = daily.agg(hllEstimate(hllMerge(col("sk"))).as("approx_union"))
    perType.filter(col("event_type") === ta)
      .select(col("est").as("approx_a"))
      .crossJoin(perType.filter(col("event_type") === tb)
        .select(col("est").as("approx_b")))
      .crossJoin(union)
      .select(
        lit(ta).as("type_a"), lit(tb).as("type_b"),
        col("approx_a"), col("approx_b"), col("approx_union"),
        (col("approx_a") + col("approx_b") - col("approx_union"))
          .as("approx_overlap"))
  }

  /** `q13_custdist` — TPC-H Q13: customer order-count distribution.
    * The canonical outer-join + double-aggregation shape: customers
    * LEFT OUTER their (filtered) orders so zero-order customers count,
    * first aggregate per customer, then the per-customer counts
    * collapse into a tiny distribution. Shuffle 1 carries (custkey,
    * orderkey) pairs; shuffle 2 carries one row per customer; the final
    * frame is ~tens of rows — each exchange is an order of magnitude
    * smaller than the last, the shape that scales.
    */
  def q13Custdist(spark: SparkSession, dir: String): DataFrame =
    q13CustdistOf(Tables(spark, dir, "customer"),
      Tables(spark, dir, "orders"))

  /** [[q13Custdist]]'s kernel on caller customer/orders. */
  def q13CustdistOf(cust: DataFrame, orders: DataFrame): DataFrame = {
    val c = cust.select(col("c_custkey"))
    val o = orders
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count")) // count(col) skips nulls
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** `agg_grouping_sets` — explicit GROUPING SETS (the general form
    * under rollup/cube): per-status totals, per-priority totals, and a
    * grand total in one pass — one shuffle, one scan, Catalyst expands
    * the sets.
    */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame =
    aggGroupingSetsOf(Tables(spark, dir, "orders"))

  /** [[aggGroupingSets]]'s kernel on any orders-shaped frame. */
  def aggGroupingSetsOf(orders: DataFrame): DataFrame = {
    orders.createOrReplaceTempView("__orders_gs")
    orders.sparkSession.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |  round(sum(o_totalprice), 2) AS sum_price,
        |  count(*) AS n_orders
        |FROM __orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** `etl_scd2` — slowly-changing-dimension type 2 history: collapse
    * each user's event-type stream into validity ranges
    * [valid_from, valid_to) per distinct run, open range (null
    * valid_to) for the current value. One shuffle on the entity key,
    * two stacked windows over the same sort — the standard way to build
    * dimension history from a change log.
    */
  def etlScd2(spark: SparkSession, dir: String): DataFrame =
    scd2Of(Tables(spark, dir, "events"))

  /** [[etlScd2]]'s kernel on any change-log frame with (user_id, ts,
    * event_id, event_type).
    */
  def scd2Of(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("changed",
        when(lag(col("event_type"), 1).over(w).isNull ||
          lag(col("event_type"), 1).over(w) =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("changed")).over(wRun))
      .groupBy(col("user_id"), col("run_id"))
      .agg(
        first(col("event_type")).as("event_type"),
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to",
        lead(col("valid_from"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("run_id"))))
      .select(col("user_id"), col("run_id"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"))
      .orderBy(col("user_id"), col("run_id"))
  }

  val BitemporalValidLagUs = 14L * 86400L * 1000000L // Tv = max ts − 14 d

  /** A42 `etl_bitemporal` — bitemporal correction report (the query
    * A14's SCD2 history can't answer alone: SCD2 tracks VALID time —
    * when a state was true; bitemporal adds TRANSACTION time — when
    * the pipeline LEARNED it, and the operational question is "which
    * as-of answers changed between two knowledge points because data
    * arrived late"): with valid-time cutoff Tv = corpus max ts −
    * 14 d and knowledge points Tx₁ = 40% of max event_id (arrival
    * order, the A31 convention) vs Tx₂ = everything, report each
    * user whose as-of-Tv state differs — 'late_insert' if the user
    * was invisible at Tx₁, 'revision' if a late event changed the
    * answer. ONE fact shuffle: both knowledge points resolve in the
    * same per-user aggregate via a conditional `max(struct)` argmax
    * (lexicographic on the unique (ts, event_id) — deterministic on
    * both engines), with the Tv/Tx bounds a one-row broadcast (the
    * q11 scalar pattern). At 100 TB this is the daily
    * late-data-reconciliation pass, priced at one aggregation.
    */
  def etlBitemporal(spark: SparkSession, dir: String): DataFrame =
    bitemporalCorrections(graft.Tables(spark, dir, "events"))

  /** [[etlBitemporal]]'s kernel on any events frame. */
  def bitemporalCorrections(ev: DataFrame): DataFrame = {
    val bounds = ev.agg(
      (unix_micros(max(col("ts"))) - BitemporalValidLagUs).as("tv_us"),
      expr("max(event_id) * 4 div 10").as("tx1"))
    ev.crossJoin(broadcast(bounds))
      .filter(unix_micros(col("ts")) <= col("tv_us"))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_id") <= col("tx1"),
          struct(col("ts"), col("event_id"), col("event_type")))).as("s1"),
        max(struct(col("ts"), col("event_id"), col("event_type")))
          .as("s2"))
      .filter(col("s1").isNull ||
        col("s1.event_type") =!= col("s2.event_type"))
      .select(col("user_id"),
        col("s1.event_type").as("type_known_t1"),
        col("s2.event_type").as("type_known_t2"),
        when(col("s1").isNull, "late_insert").otherwise("revision")
          .as("correction"))
      .orderBy(col("user_id"))
  }

  /** `agg_salted_skew` — two-phase salted aggregation: the standard
    * counter to key skew. `event_type` has only 5 values, so a direct
    * groupBy lands all 10M+ rows-per-type on 5 reducers at scale; the
    * salt fans each hot key across 16 partial groups (map-side combine
    * still applies), and the second phase merges 5×16 tiny partials.
    * Same result as the direct groupBy — the oracle is the unsalted SQL.
    */
  def aggSaltedSkew(spark: SparkSession, dir: String): DataFrame =
    aggSaltedSkewOf(Tables(spark, dir, "events"))

  /** [[aggSaltedSkew]]'s kernel on any events-shaped frame. */
  def aggSaltedSkewOf(events: DataFrame): DataFrame = {
    val salted = events
      .withColumn("salt", pmod(hash(col("event_id")), lit(16)))
    salted
      .groupBy(col("event_type"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("pv"))
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n_events"),
        round(sum(col("pv")), 2).as("sum_value"))
      .orderBy(col("event_type"))
  }

  /** `join_salted_skew` — salted JOIN, the companion to the salted
    * aggregation above for when the join itself is the skew victim:
    * `event_type` has 5 values, so an unsalted shuffle join puts every
    * row of a hot type in one task. The fact side salts each row
    * (pmod(hash(event_id), 16)); the dim side replicates 16× with an
    * exploded salt column; joining on (key, salt) spreads each hot key
    * over 16 tasks. The shuffle_hash hint keeps the demo honest — this
    * technique is for two sides too big to broadcast (with a broadcast
    * the skew never materializes and no salt is needed). Result is
    * identical to the unsalted join — the oracle is the plain SQL.
    */
  def joinSaltedSkew(spark: SparkSession, dir: String): DataFrame =
    joinSaltedSkewOf(Tables(spark, dir, "events"))

  /** [[joinSaltedSkew]]'s kernel on any events-shaped frame. */
  def joinSaltedSkewOf(events: DataFrame): DataFrame = {
    val Salt = 16
    val dim = events.select(col("event_type")).distinct()
      .withColumn("type_weight", length(col("event_type")).cast("double"))
    val saltedDim = dim
      .withColumn("salt", explode(sequence(lit(0), lit(Salt - 1))))
      .hint("shuffle_hash")
    events
      .withColumn("salt", pmod(hash(col("event_id")), lit(Salt)))
      .join(saltedDim, Seq("event_type", "salt"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value") * col("type_weight")), 2)
          .as("weighted_value"))
      .orderBy(col("event_type"))
  }

  /** B14 `agg_percentiles` — exact percentiles (sorted-merge agg).
    * At 100 TB prefer approx_percentile; exact kept for oracle parity
    * and as the correctness baseline.
    */
  def aggPercentiles(spark: SparkSession, dir: String): DataFrame =
    aggPercentilesOf(Tables(spark, dir, "lineitem"))

  /** [[aggPercentiles]]'s kernel on any lineitem-shaped frame.
    *
    * The three cut points come from ONE `percentile(x, array(...))`
    * aggregate, not three scalar `percentile` calls: each scalar call
    * builds and shuffles its OWN value-counts buffer (the r15 baseline
    * measured 16.1 MB of partial-aggregation buffers through the
    * exchange — 3× the values), while the array form shares one buffer
    * and computes all cut points from the same sorted counts (guide
    * §2.3, shuffle fewer bytes). Same exact-percentile definition and
    * interpolation, element-wise identical results.
    */
  def aggPercentilesOf(li: DataFrame): DataFrame =
    li
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))")
        .as("pcts"))
      .select(col("l_returnflag"),
        round(element_at(col("pcts"), 1), 4).as("p25"),
        round(element_at(col("pcts"), 2), 4).as("p50"),
        round(element_at(col("pcts"), 3), 4).as("p75"))
      .orderBy(col("l_returnflag"))

  /** B30 `join_bloom_prefilter` — the runtime-filter join pattern made
    * explicit: build a Bloom filter over the SELECTIVE dimension side's
    * join keys (distributed partial sketches, merged to one small
    * binary), probe it in the fact scan BEFORE the shuffle, then run
    * the exact join. False positives are cleared by the join itself, so
    * the result is exact — the bloom only cuts the rows that would have
    * shuffled and missed. At 100 TB this is the difference between
    * shuffling 100 TB of lineitem and shuffling the ~2% that can match;
    * Spark's own InjectRuntimeFilter does this opportunistically, doing
    * it explicitly guarantees it (and survives AQE replanning).
    */
  def joinBloomPrefilter(spark: SparkSession, dir: String): DataFrame =
    joinBloomPrefilterOf(Tables(spark, dir, "orders"),
      Tables(spark, dir, "lineitem"))

  /** [[joinBloomPrefilter]]'s kernel on caller orders/lineitem. */
  def joinBloomPrefilterOf(orders: DataFrame,
      lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.GraftShim
    val dim = orders
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 150000)
      .select(col("o_orderkey"), col("o_orderdate"))
    // one tiny driver-side binary, sized to the ACTUAL filtered key
    // count (an oversized bloom rides along in every task binary; the
    // dim pre-count is a cheap small-table scan next to the fact scan
    // it saves)
    val nKeys = math.max(1000L, dim.count())
    val bloom = dim.agg(
      GraftShim.bloomFilterAgg(col("o_orderkey"), nKeys).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val fact = lineitem
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .filter(GraftShim.bloomMightContain(lit(bloom), col("l_orderkey")))
    fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
      .agg(
        count(lit(1)).as("n_lineitems"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        // decimal-exact revenue: the month groups are large enough that
        // double accumulation order can land on a .xx5 rounding
        // boundary and flip the last cent between engines
        round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")), 2).cast("double").as("revenue"))
      .orderBy(col("order_month"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "join_bloom_prefilter" -> (joinBloomPrefilter _),
    "q3_shipping" -> (q3Shipping _),
    "q5_local_supplier" -> (q5LocalSupplier _),
    "join_broadcast" -> (joinBroadcast _),
    "join_semi" -> (joinSemi _),
    "join_anti" -> (joinAnti _),
    "agg_rollup" -> (aggRollup _),
    "agg_cube" -> (aggCube _),
    "agg_distinct" -> (aggDistinct _),
    "agg_approx_distinct" -> (aggApproxDistinct _),
    "agg_salted_skew" -> (aggSaltedSkew _),
    "join_salted_skew" -> (joinSaltedSkew _),
    "agg_percentiles" -> (aggPercentiles _),
    "set_ops" -> (setOps _),
    "q18_large_orders" -> (q18LargeOrders _),
    "q13_custdist" -> (q13Custdist _),
    "agg_hll_partial" -> (aggHllPartial _),
    "hll_overlap" -> (hllOverlap _),
    "unpivot_metrics" -> (unpivotMetrics _),
    "agg_grouping_sets" -> (aggGroupingSets _),
    "etl_scd2" -> (etlScd2 _),
    "etl_bitemporal" -> (etlBitemporal _)
  )

  /** Replays [[graft.functions.HllOps]] end-to-end in SQL over a
    * `d(grp, x)` CTE of distinct (group, value) pairs: splitmix64 in
    * HUGEINT modular arithmetic (same 32-bit-split multiply trick as
    * the dedup oracles), rho = first-set-bit scan of the 52-bit field
    * capped at 31, the harmonic sum as the exact integer Σ 2^(31−M_j)
    * (empty registers contribute 2^31 each), then the identical
    * float spelling: AlphaM2Two31 / S, linear counting below 2.5m,
    * floor(x + 0.5). Produces `hll(grp, approx)`.
    */
  private def hllOracleKernel: String = {
    val M64 = "CAST('18446744073709551616' AS HUGEINT)"
    s"""z0 AS (SELECT grp, CAST(x AS HUGEINT) AS z FROM d),
       |h1 AS (SELECT grp, (z + CAST('11400714819323198485' AS HUGEINT))
       |    % $M64 AS z FROM z0),
       |h2 AS (SELECT grp, ((xor(z, z // 1073741824)*484763065)
       |      % $M64
       |    + ((xor(z, z // 1073741824)*3210233709) % 4294967296)
       |      * 4294967296)
       |    % $M64 AS z FROM h1),
       |h3 AS (SELECT grp, ((xor(z, z // 134217728)*321982955)
       |      % $M64
       |    + ((xor(z, z // 134217728)*2496678331) % 4294967296)
       |      * 4294967296)
       |    % $M64 AS z FROM h2),
       |hh AS (SELECT grp, xor(z, z // 2147483648) AS h FROM h3),
       |reg AS (SELECT grp, h % 4096 AS bucket,
       |    max(coalesce(list_min([r for r in range(1, 32)
       |      if ((h // 4096) // (CAST(1 AS HUGEINT)
       |        << CAST(52 - r AS INT))) % 2 = 1]), 31)) AS m
       |  FROM hh GROUP BY grp, h % 4096),
       |s AS (SELECT grp,
       |    CAST(sum(CAST(1 AS BIGINT) << CAST(31 - m AS INT)) AS BIGINT)
       |      + (4096 - count(*)) * CAST(2147483648 AS BIGINT) AS ss,
       |    4096 - count(*) AS v
       |  FROM reg GROUP BY grp),
       |est AS (SELECT grp,
       |    CASE WHEN (${graft.functions.HllOps.AlphaM2Two31}
       |        / CAST(ss AS DOUBLE)) <= 10240 AND v > 0
       |      THEN 4096 * ln(4096 / CAST(v AS DOUBLE))
       |      ELSE ${graft.functions.HllOps.AlphaM2Two31}
       |        / CAST(ss AS DOUBLE) END AS est
       |  FROM s),
       |hll AS (SELECT grp, CAST(floor(est + 0.5) AS BIGINT) AS approx
       |  FROM est)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "agg_approx_distinct" ->
      s"""WITH d AS (SELECT DISTINCT l_returnflag AS grp, l_partkey AS x
         |    FROM lineitem),
         |$hllOracleKernel,
         |cnt AS (SELECT l_returnflag AS grp, count(*) AS n_rows
         |  FROM lineitem GROUP BY 1)
         |SELECT h.grp AS l_returnflag, h.approx AS approx_parts, c.n_rows
         |FROM hll h JOIN cnt c USING (grp) ORDER BY l_returnflag""".stripMargin,
    "agg_hll_partial" ->
      s"""WITH d AS (SELECT DISTINCT event_type AS grp, user_id AS x
         |    FROM events),
         |$hllOracleKernel,
         |days AS (SELECT event_type AS grp,
         |    count(DISTINCT CAST(ts AS DATE)) AS n_days
         |  FROM events GROUP BY 1)
         |SELECT h.grp AS event_type, dy.n_days, h.approx AS approx_users
         |FROM hll h JOIN days dy USING (grp) ORDER BY event_type""".stripMargin,
    // hll_overlap: three sketch groups (each type + their union) through
    // the same kernel; register max is associative, so sketching the
    // union's distinct set equals merging the stored partials
    "hll_overlap" ->
      s"""WITH d AS (
         |  SELECT DISTINCT event_type AS grp, user_id AS x FROM events
         |  WHERE event_type IN ('view', 'purchase')
         |  UNION
         |  SELECT DISTINCT 'both' AS grp, user_id FROM events
         |  WHERE event_type IN ('view', 'purchase')),
         |$hllOracleKernel
         |SELECT 'view' AS type_a, 'purchase' AS type_b,
         |  a.approx AS approx_a, b.approx AS approx_b,
         |  u.approx AS approx_union,
         |  a.approx + b.approx - u.approx AS approx_overlap
         |FROM hll a, hll b, hll u
         |WHERE a.grp = 'view' AND b.grp = 'purchase'
         |  AND u.grp = 'both'""".stripMargin,
    "join_bloom_prefilter" ->
      """SELECT date_trunc('month', o_orderdate) AS order_month,
        |  count(*) AS n_lineitems,
        |  count(DISTINCT o_orderkey) AS n_orders,
        |  CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
        |GROUP BY 1 ORDER BY order_month""".stripMargin,
    // q1_agg/q5: exact integer-cent money sums (r14 sweep — the r13
    // agg_rollup fix applied to every fact-scale group sum)
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
        |    AS sum_base_price,
        |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
        |    AS BIGINT)) / 100.0 AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(sum(CAST(round(l_discount * 100, 0) AS BIGINT))
        |    / 100.0 / count(*), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey, o_orderdate,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
        |    AS BIGINT)) / 100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1994-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS sum_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
        |ORDER BY c_custkey""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 250000.0)
        |ORDER BY c_custkey""".stripMargin,
    // exact integer-cent sums (r13): a double sum over the whole fact
    // table is partial-merge-order dependent — the 2-dp round flipped
    // between runs at the factor-10 gate. CAST before sum matches
    // Spark's long accumulation exactly.
    "agg_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
        |    AS sum_price,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0
        |    AS sum_price,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "agg_distinct" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  round(sum(o_totalprice), 2) AS sum_price,
        |  count(*) AS n_orders
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin,
    // etl_bitemporal: both knowledge points replay as rounded
    // row_number argmaxes over the same Tv-filtered log
    "etl_bitemporal" ->
      s"""WITH b AS (SELECT max(epoch_us(ts)) - $BitemporalValidLagUs
         |      AS tv_us,
         |    max(event_id) * 4 // 10 AS tx1 FROM events),
         |e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us
         |  FROM events CROSS JOIN b WHERE epoch_us(ts) <= b.tv_us),
         |s2 AS (SELECT user_id, event_type FROM (
         |    SELECT user_id, event_type, row_number() OVER (
         |      PARTITION BY user_id ORDER BY us DESC, event_id DESC)
         |      AS rn FROM e)
         |  WHERE rn = 1),
         |s1 AS (SELECT user_id, event_type FROM (
         |    SELECT e.user_id, e.event_type, row_number() OVER (
         |      PARTITION BY e.user_id ORDER BY e.us DESC, e.event_id DESC)
         |      AS rn FROM e CROSS JOIN b WHERE e.event_id <= b.tx1)
         |  WHERE rn = 1)
         |SELECT s2.user_id, s1.event_type AS type_known_t1,
         |  s2.event_type AS type_known_t2,
         |  CASE WHEN s1.user_id IS NULL THEN 'late_insert'
         |    ELSE 'revision' END AS correction
         |FROM s2 LEFT JOIN s1 ON s1.user_id = s2.user_id
         |WHERE s1.user_id IS NULL OR s1.event_type <> s2.event_type
         |ORDER BY s2.user_id""".stripMargin,
    "etl_scd2" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |      OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END
        |      AS changed
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runs AS (
        |  SELECT user_id, event_type, ts,
        |    CAST(sum(changed) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS run_id
        |  FROM flagged),
        |grouped AS (
        |  SELECT user_id, run_id, min(event_type) AS event_type,
        |    min(ts) AS valid_from, count(*) AS n_events
        |  FROM runs GROUP BY user_id, run_id)
        |SELECT user_id, run_id, event_type, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
        |    AS valid_to,
        |  n_events
        |FROM grouped ORDER BY user_id, run_id""".stripMargin,
    "set_ops" ->
      """WITH rich AS (SELECT c_custkey, c_name FROM customer
        |    WHERE c_acctbal > 5000),
        |building AS (SELECT c_custkey, c_name FROM customer
        |    WHERE c_mktsegment = 'BUILDING')
        |SELECT c_custkey, c_name, 'union' AS tag
        |  FROM (SELECT * FROM rich UNION SELECT * FROM building)
        |UNION ALL
        |SELECT c_custkey, c_name, 'both' AS tag
        |  FROM (SELECT * FROM rich INTERSECT SELECT * FROM building)
        |UNION ALL
        |SELECT c_custkey, c_name, 'rich_only' AS tag
        |  FROM (SELECT * FROM rich EXCEPT SELECT * FROM building)
        |ORDER BY tag, c_custkey""".stripMargin,
    "unpivot_metrics" ->
      """WITH w AS (SELECT l_returnflag,
        |    round(sum(l_quantity), 2) AS sum_qty,
        |    sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0
        |      AS sum_base_price,
        |    CAST(count(*) AS DOUBLE) AS n_rows
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, metric, value FROM (
        |  SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM w
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_base_price', sum_base_price FROM w
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_qty', sum_qty FROM w)
        |ORDER BY l_returnflag, metric""".stripMargin,
    "q13_custdist" ->
      """WITH per_cust AS (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT OUTER JOIN orders o
        |    ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '1-URGENT'
        |  GROUP BY c.c_custkey)
        |SELECT c_count, count(*) AS custdist
        |FROM per_cust GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey, sum(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |SELECT o_orderkey, o_custkey, o_orderdate,
        |  round(o_totalprice, 2) AS o_totalprice,
        |  round(total_qty, 2) AS total_qty
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "agg_salted_skew" ->
      """SELECT event_type, count(*) AS n_events,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "join_salted_skew" ->
      """WITH dim AS (
        |  SELECT DISTINCT event_type,
        |    CAST(length(event_type) AS DOUBLE) AS type_weight
        |  FROM events)
        |SELECT e.event_type, count(*) AS n_events,
        |  round(sum(e.value * d.type_weight), 2) AS weighted_value
        |FROM events e JOIN dim d USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "agg_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
