package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Window-function operators (SURVEY.md §2 B9–B11, B16).
  *
  * All windows partition on a high-cardinality entity key (custkey /
  * user_id), so at cluster scale each executor sorts only its own key
  * ranges — one shuffle, in-partition sort, no global ordering.
  */
object Windowed {

  /** B9 `win_rank_topn` — per-customer top-3 orders. Unique orderkey
    * tiebreak keeps row_number deterministic.
    */
  def rankTopN(spark: SparkSession, dir: String): DataFrame =
    rankTopNOf(Tables(spark, dir, "orders"))

  /** [[rankTopN]]'s kernel on any orders-shaped frame. */
  def rankTopNOf(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .withColumn("rank_in_cust", row_number().over(w))
      .filter(col("rank_in_cust") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        col("rank_in_cust"))
      .orderBy(col("o_custkey"), col("rank_in_cust"))
  }

  /** B10 `win_running_sum` — running revenue per customer in order-date
    * order (orderkey tiebreak for determinism).
    */
  def runningSum(spark: SparkSession, dir: String): DataFrame =
    runningSumOf(Tables(spark, dir, "orders"))

  /** [[runningSum]]'s kernel on any orders-shaped frame. */
  def runningSumOf(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders
      .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("running_total"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** B11 `win_lag_delta` — day-over-day revenue deltas. The daily
    * pre-aggregation collapses the data before the (single-partition)
    * date window; at 100 TB the grouped input is one row per day, so
    * the unpartitioned window is safe.
    */
  def lagDelta(spark: SparkSession, dir: String): DataFrame =
    lagDeltaOf(Tables(spark, dir, "orders"))

  /** [[lagDelta]]'s kernel on any orders-shaped frame. */
  def lagDeltaOf(orders: DataFrame): DataFrame = {
    // exact integer-cent daily revenue (r14 sweep): day groups are
    // fact-scale, so the double sum's round is merge-order dependent
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("order_day"))
      .agg((sum(round(col("o_totalprice") * 100, 0).cast("long")) / 100.0)
        .as("revenue"))
    val w = Window.orderBy(col("order_day"))
    daily
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("delta", round(col("revenue") - col("prev_revenue"), 2))
      .orderBy(col("order_day"))
  }

  /** B16 `sessionize` — time-gap sessionization of the events stream:
    * a session break is >30 min of inactivity. Single shuffle on
    * user_id; gap detection and session numbering are two stacked
    * windows over the same partitioning (one sort, reused).
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionizeOf(Tables(spark, dir, "events"))

  /** [[sessionize]]'s kernel on any events-shaped frame. */
  def sessionizeOf(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        round(sum(col("value")), 2).as("session_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** `win_ntile` — equal-frequency bucketing of customers by balance
    * (quartiles), the windowed binning primitive for feature
    * engineering. Unpartitioned ntile is single-partition by nature;
    * for 100 TB use approx quantile cutpoints instead — kept here for
    * the exact-semantics surface, like B14.
    */
  def winNtile(spark: SparkSession, dir: String): DataFrame =
    winNtileOf(Tables(spark, dir, "customer"))

  /** [[winNtile]]'s kernel on any customer-shaped frame. */
  def winNtileOf(cust: DataFrame): DataFrame = {
    val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
    cust
      .withColumn("quartile", ntile(4).over(w))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("c_acctbal")), 2).as("min_bal"),
        round(max(col("c_acctbal")), 2).as("max_bal"))
      .orderBy(col("quartile"))
  }

  /** `date_parts` — calendar decomposition + date arithmetic over the
    * order stream: year/quarter/month extraction and order age in days
    * at a fixed as-of date. All codegen'd date intrinsics.
    */
  def dateParts(spark: SparkSession, dir: String): DataFrame =
    datePartsOf(Tables(spark, dir, "orders"))

  /** [[dateParts]]'s kernel on any orders-shaped frame. */
  def datePartsOf(orders: DataFrame): DataFrame =
    orders
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofweek(col("o_orderdate")).as("dow"),
        datediff(lit("2001-09-01").cast("date"),
          to_date(col("o_orderdate"))).as("age_days"))
      .orderBy(col("o_orderkey"))

  /** B34 `win_moving_avg` — trailing 7-day moving average with a RANGE
    * frame: unlike a ROWS frame, missing calendar days still count
    * against the horizon (the frame is value-bounded, not row-bounded).
    * Pre-aggregation to one row per (type, day) collapses the data
    * before any window runs — the window input is O(types × days)
    * regardless of event volume.
    */
  def movingAvg(spark: SparkSession, dir: String): DataFrame =
    movingAvgOf(Tables(spark, dir, "events"))

  /** [[movingAvg]]'s kernel on any events-shaped frame. */
  def movingAvgOf(events: DataFrame): DataFrame = {
    // exact integer-cent daily sums (r14 sweep — fact-scale day
    // groups); ma7 averages ≤ 7 already-deterministic day values
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(round(col("value") * 100, 0).cast("long")) / 100.0)
        .as("day_value"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(datediff(col("day"), lit("1970-01-01").cast("date")))
      .rangeBetween(-6, Window.currentRow)
    daily
      .withColumn("ma7", round(avg(col("day_value")).over(w), 4))
      .select(col("event_type"), col("day"), col("day_value"), col("ma7"))
      .orderBy(col("event_type"), col("day"))
  }

  /** `win_hopping` — hopping (sliding) time-window aggregation: 1-hour
    * windows advancing every 15 minutes, so each event lands in
    * duration/slide = 4 overlapping windows (the smoothing shape
    * dashboards and rate-limit monitors read). Spark's `window()`
    * generates the per-event window memberships inline — a map-only
    * 4× fan-out, shuffled once on (window, type); no self-join, no
    * per-window rescans. The same aggregation is streaming-legal
    * against a watermark (the tumbling form runs live as G1).
    */
  def winHopping(spark: SparkSession, dir: String): DataFrame =
    winHoppingOf(Tables(spark, dir, "events"))

  /** [[winHopping]]'s kernel on any events-shaped frame. */
  def winHoppingOf(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"),
        col("event_type"))
      // exact integer-cent sums (r14 sweep): fact-scale window groups
      .agg(
        count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100, 0).cast("long")) / 100.0)
          .as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_hopping" -> (winHopping _),
    "win_moving_avg" -> (movingAvg _),
    "win_rank_topn" -> (rankTopN _),
    "win_running_sum" -> (runningSum _),
    "win_lag_delta" -> (lagDelta _),
    "win_ntile" -> (winNtile _),
    "date_parts" -> (dateParts _),
    "sessionize" -> (sessionize _)
  )

  val oracle: Map[String, String] = Map(
    // win_hopping: each event expands to its 4 hop memberships (the
    // 15-min bucket minus h hops, h ∈ 0..3) — same epoch-aligned grid
    // as Spark's window(ts, '1 hour', '15 minutes')
    "win_hopping" ->
      """WITH g AS (SELECT time_bucket(INTERVAL '15 minutes', ts) AS b,
        |    event_type, value
        |  FROM events),
        |h AS (SELECT b - (hh.h * INTERVAL '15 minutes') AS window_start,
        |    event_type, value
        |  FROM g, (SELECT unnest(range(0, 4)) AS h) hh)
        |SELECT window_start,
        |  window_start + INTERVAL '1 hour' AS window_end,
        |  event_type, count(*) AS n_events,
        |  sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0
        |    AS sum_value
        |FROM h GROUP BY 1, 2, 3
        |ORDER BY window_start, event_type""".stripMargin,
    "win_moving_avg" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0
        |      AS day_value
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, day_value,
        |  round(avg(day_value) OVER (PARTITION BY event_type
        |    ORDER BY day - DATE '1970-01-01'
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
        |FROM daily ORDER BY event_type, day""".stripMargin,
    "win_ntile" ->
      """SELECT quartile, count(*) AS n,
        |  round(min(c_acctbal), 2) AS min_bal,
        |  round(max(c_acctbal), 2) AS max_bal
        |FROM (SELECT c_acctbal, ntile(4) OVER (
        |    ORDER BY c_acctbal DESC, c_custkey) AS quartile
        |  FROM customer)
        |GROUP BY quartile ORDER BY quartile""".stripMargin,
    "date_parts" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  quarter(o_orderdate) AS q,
        |  month(o_orderdate) AS m,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  datediff('day', CAST(o_orderdate AS DATE), DATE '2001-09-01')
        |    AS age_days
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "win_rank_topn" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice,
        |  rank_in_cust
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_cust
        |  FROM orders)
        |WHERE rank_in_cust <= 3
        |ORDER BY o_custkey, rank_in_cust""".stripMargin,
    "win_running_sum" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "win_lag_delta" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS order_day,
        |    sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0
        |      AS revenue
        |  FROM orders GROUP BY 1)
        |SELECT order_day, revenue,
        |  lag(revenue, 1) OVER (ORDER BY order_day) AS prev_revenue,
        |  round(revenue - lag(revenue, 1) OVER (ORDER BY order_day), 2)
        |    AS delta
        |FROM daily
        |ORDER BY order_day""".stripMargin,
    "sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |numbered AS (
        |  SELECT user_id, ts, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  round(sum(value), 2) AS session_value
        |FROM numbered
        |GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin
  )
}
