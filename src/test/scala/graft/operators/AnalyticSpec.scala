package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the round-3 analytic batch — properties the
  * DuckDB oracle compare can't express (determinism across runs,
  * probability-mass conservation, quartile balance).
  */
class AnalyticSpec extends SparkSpec {

  private def cpEvents(rows: Seq[(String, Int)]) = {
    import spark.implicits._
    // one event per (type, day-offset) tuple, midnight UTC + offset days
    rows.map { case (t, d) =>
      (t, new java.sql.Timestamp(1704067200000L + d * 86400000L))
    }.toDF("event_type", "ts")
  }

  test("ts_changepoint: a planted level shift is found at its boundary " +
      "and flagged; a flat series is not flagged") {
    // step: 2/day for days 0..9, then 20/day for days 10..19 — the
    // max-|nS| day is the last low day; flat: 5/day for 20 days
    val step = (0 until 10).flatMap(d => Seq.fill(2)(("step", d))) ++
      (10 until 20).flatMap(d => Seq.fill(20)(("step", d)))
    val flat = (0 until 20).flatMap(d => Seq.fill(5)(("flat", d)))
    val out = Analytic.changepoint(cpEvents(step ++ flat)).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val s = out("step")
    assert(s.getAs[java.sql.Date]("cp_day").toString == "2024-01-10",
      s"cp_day = ${s.getAs[java.sql.Date]("cp_day")}")
    // hand CUSUM: n=20, T=220, cum_10=20 → |20·20 − 10·220| = 1800
    assert(s.getAs[Long]("stat") == 1800L)
    // 4·1800² > 9·400·220 → flagged
    assert(s.getAs[Int]("flagged") == 1)
    val f = out("flat")
    // flat: cum_t = 5t → |20·5t − t·100| = 0 at every t → never flags
    assert(f.getAs[Long]("stat") == 0L)
    assert(f.getAs[Int]("flagged") == 0)
  }

  test("ts_changepoint: deterministic and exercised on the sf tables") {
    val a = Analytic.tsChangepoint(spark, sfDir).collect()
    val b = Analytic.tsChangepoint(spark, sfDir).collect()
    assert(a.nonEmpty)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    a.foreach { r =>
      assert(r.getAs[Long]("stat") >= 0)
      assert(r.getAs[Long]("n_days") > 1)
    }
  }

  test("events_markov: transition probabilities sum to 1 per prev state") {
    val sums = Analytic.eventsMarkov(spark, sfDir)
      .groupBy(col("prev")).agg(sum(col("p")).as("total"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach { r =>
      val t = r.getDouble(1)
      // per-row rounding to 4 decimals can drift the sum by ~types*5e-5
      assert(math.abs(t - 1.0) < 1e-3, s"prev=${r.get(0)} sums to $t")
    }
  }

  test("orders_open_by_day: sweep conserves, matches a direct count") {
    val rows = Analytic.ordersOpenByDay(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("delta")).sum == 0,
      "every +1 open must have its -1 close")
    rows.foreach(r => assert(r.getAs[Long]("n_open") >= 0))
    assert(rows.last.getAs[Long]("n_open") == 0,
      "after the last close date nothing is open")
    // cross-check a mid-series change point against a direct count
    val mid = rows(rows.length / 2)
    val day = mid.getAs[java.sql.Date]("day")
    val direct = {
      val li = graft.Tables(spark, sfDir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(to_date(col("l_shipdate"))).as("close_day"))
      graft.Tables(spark, sfDir, "orders")
        .join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .filter(to_date(col("o_orderdate")) <= lit(day) &&
          coalesce(col("close_day"), to_date(col("o_orderdate")))
            >= lit(day))
        .count()
    }
    assert(mid.getAs[Long]("n_open") == direct,
      s"sweep count at $day disagrees with the direct interval count")
  }

  test("win_hopping: every event lands in exactly duration/slide windows") {
    val rows = Windowed.winHopping(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_events")).sum
    val events = graft.Tables(spark, sfDir, "events").count()
    assert(total == 4 * events,
      s"hop fan-out $total != 4 × $events (1h windows / 15min hops)")
    rows.foreach { r =>
      val s = r.getAs[java.sql.Timestamp]("window_start")
      val e = r.getAs[java.sql.Timestamp]("window_end")
      assert(e.getTime - s.getTime == 3600 * 1000L)
      assert(s.getTime % (15 * 60 * 1000L) == 0, "start off the hop grid")
    }
  }

  test("graph_pagerank: ranks form a distribution, rank is a permutation") {
    val rows = Analytic.graphPagerank(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val mass = rows.map(_.getAs[Double]("pagerank")).sum
    // damping + dangling redistribution conserve probability mass
    assert(math.abs(mass - 1.0) < 1e-3, s"pagerank mass $mass")
    rows.foreach(r => assert(r.getAs[Double]("pagerank") > 0.0))
    val ranks = rows.map(_.getAs[Int]("rank")).sorted
    assert(ranks.toSeq == (1 to rows.length))
  }

  test("ts_ewma: first row anchors at rev, state stays inside prefix range") {
    val rows = Analytic.tsEwma(spark, sfDir).collect()
      .groupBy(_.getAs[String]("event_type"))
    assert(rows.nonEmpty)
    rows.foreach { case (_, series) =>
      val byDay = series.sortBy(_.getAs[java.sql.Date]("day").toString)
      assert(byDay.head.getAs[Double]("ewma") ==
        byDay.head.getAs[Double]("rev"))
      var lo = byDay.head.getAs[Double]("rev")
      var hi = lo
      byDay.tail.foreach { r =>
        lo = math.min(lo, r.getAs[Double]("rev"))
        hi = math.max(hi, r.getAs[Double]("rev"))
        val e = r.getAs[Double]("ewma")
        // convex combination of prefix values; the per-step <1-cent
        // floor bias compounds to at most Σ0.7^k ≈ 3.3 cents
        assert(e >= lo - 0.05 && e <= hi + 0.01,
          s"ewma $e escaped prefix range [$lo, $hi]")
      }
    }
  }

  test("ts_holt: fold replays the sequential recurrence exactly") {
    val rows = Analytic.tsHolt(spark, sfDir).collect()
      .groupBy(_.getAs[String]("event_type"))
    assert(rows.nonEmpty)
    def floorDiv10(n: Long): Long = Math.floorDiv(n, 10L)
    rows.foreach { case (tpe, series) =>
      val byDay = series.sortBy(_.getAs[java.sql.Date]("day").toString)
      // sequential replay in cents (the definition, not the fold)
      var l = math.round(byDay.head.getAs[Double]("rev") * 100)
      var t = 0L
      byDay.zipWithIndex.foreach { case (r, i) =>
        if (i > 0) {
          val x = math.round(r.getAs[Double]("rev") * 100)
          val lNew = floorDiv10(5 * x + 5 * (l + t))
          t = floorDiv10(3 * (lNew - l) + 7 * t)
          l = lNew
        }
        assert(math.round(r.getAs[Double]("level") * 100) == l,
          s"$tpe day $i: level diverged from the sequential replay")
        assert(math.round(r.getAs[Double]("trend") * 100) == t,
          s"$tpe day $i: trend diverged from the sequential replay")
        assert(r.getAs[Double]("forecast_next") ==
          (l + t) / 100.0, "forecast must be level + trend")
      }
    }
    // the data must dip somewhere: a negative trend is what separates
    // the floor spelling from truncation — untested otherwise
    assert(Analytic.tsHolt(spark, sfDir).collect()
      .exists(_.getAs[Double]("trend") < 0),
      "test series must exercise negative trend (floor-div path)")
  }

  test("ts_gapfill: dense calendar, gaps zero-counted and value-carried") {
    val rows = Analytic.tsGapfill(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getAs[Long]("is_gap") == 1L),
      "threshold must leave real holes at sf0.001")
    // per type: days are contiguous (dense spine)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val days = rs.map(_.getDate(1).toLocalDate).sortBy(_.toEpochDay)
      days.zip(days.tail).foreach { case (a, b) =>
        assert(b.toEpochDay - a.toEpochDay == 1, s"hole in spine at $a")
      }
    }
    rows.foreach { r =>
      if (r.getAs[Long]("is_gap") == 1L)
        assert(r.getAs[Long]("n_events") == 0L)
    }
  }

  test("agg_hist_quantiles: within one bucket width of exact quantiles") {
    val approx = Analytic.aggHistQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("p50_approx"), r.getAs[Double]("p95_approx"))).toMap
    assert(approx.nonEmpty)
    val exact = graft.Tables(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (t, (e50, e95)) =>
      val (a50, a95) = approx(t)
      assert(math.abs(a50 - e50) <= Analytic.HistW,
        s"$t p50 approx $a50 vs exact $e50")
      assert(math.abs(a95 - e95) <= Analytic.HistW,
        s"$t p95 approx $a95 vs exact $e95")
    }
  }

  test("win_distribution: pct_rank/cume in [0,1], cume hits 1 per stratum") {
    val rows = Analytic.winDistribution(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, c) = (r.getAs[Double]("pct_rank"), r.getAs[Double]("cume"))
      assert(p >= 0.0 && p <= 1.0 && c > 0.0 && c <= 1.0)
    }
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Double]("cume")).max == 1.0)
    }
  }

  test("abc_pareto: share monotone to 1.0, classes partition by share") {
    val rows = Analytic.abcPareto(spark, sfDir).collect()
    val shares = rows.map(_.getAs[Double]("run_share"))
    shares.zip(shares.tail).foreach { case (a, b) => assert(a <= b) }
    assert(math.abs(shares.last - 1.0) < 1e-6)
    rows.foreach { r =>
      val s = r.getAs[Double]("run_share")
      val cls = r.getAs[String]("abc_class")
      assert(cls == (if (s <= 0.5) "A" else if (s <= 0.8) "B" else "C"))
    }
  }

  test("events_cooccur: symmetric bounds, n_both <= min(n_a, n_b)") {
    val rows = Analytic.eventsCooccur(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("type_a") < r.getAs[String]("type_b"))
      assert(r.getAs[Long]("n_both") <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }

  test("robust_stats: mad and iqr non-negative, med within [p-range]") {
    val rows = Analytic.robustStats(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("mad") >= 0.0)
      assert(r.getAs[Double]("iqr") >= 0.0)
      assert(r.getAs[Long]("n_events") > 0)
    }
  }

  test("corr_stats: correlations within [-1, 1], stddevs positive") {
    Analytic.corrStats(spark, sfDir).collect().foreach { r =>
      val corr = r.getDouble(r.fieldIndex("qty_price_corr"))
      assert(corr >= -1.0 && corr <= 1.0)
      assert(r.getDouble(r.fieldIndex("qty_stddev")) > 0)
      assert(r.getDouble(r.fieldIndex("price_stddev")) > 0)
    }
  }

  test("orders_rfm: quartile segments partition all customers") {
    val seg = Analytic.ordersRfm(spark, sfDir).collect()
    val totalCustomers = graft.Tables(spark, sfDir, "orders")
      .select(col("o_custkey")).distinct().count()
    assert(seg.map(_.getLong(seg.head.fieldIndex("n_customers"))).sum
      == totalCustomers)
    // segment digits stay in 1..4
    seg.foreach { r =>
      assert(r.getString(0).matches("[1-4][1-4][1-4]"), r.getString(0))
    }
  }

  test("sample_pergroup: at most 10 per group, stable across runs") {
    val a = Analytic.samplePergroup(spark, sfDir).collect().map(_.toString)
    val b = Analytic.samplePergroup(spark, sfDir).collect().map(_.toString)
    assert(a.sameElements(b), "sampler must be run-deterministic")
    val perGroup = Analytic.samplePergroup(spark, sfDir)
      .groupBy(col("lang")).count().collect()
    perGroup.foreach(r => assert(r.getLong(1) <= 10))
  }

  test("win_first_last: first_value matches the earliest event per user") {
    val got = Analytic.winFirstLast(spark, sfDir)
      .select(col("user_id"), col("first_value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = graft.Tables(spark, sfDir, "events")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), round(col("value"), 2).as("v")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expected)
  }

  test("q6_revenue: decimal-cast sum equals a double recompute to the cent") {
    val row = Analytic.q6Revenue(spark, sfDir).head()
    val naive = graft.Tables(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice") * col("l_discount"))).head().getDouble(0)
    assert(math.abs(row.getDouble(row.fieldIndex("revenue")) - naive) < 0.02)
    assert(row.getLong(row.fieldIndex("n_lineitems")) > 0)
  }

  test("agg_exact_median: planted groups — bucketed search lands the " +
      "exact order statistic across bucket boundaries") {
    import spark.implicits._
    def ev(t: String, vs: Double*) = vs.zipWithIndex.map { case (v, i) =>
      (t, v, new java.sql.Timestamp(1704067200000L + i * 1000L))
    }
    // a: even count, lower median; b: median in bucket 0 with a far
    // outlier; c: median sits in the SECOND bucket (r = 1 inside it)
    val rows = ev("a", 1.0, 2.0, 3.0, 4.0) ++
      ev("b", 0.5, 99.0, 101.0) ++
      ev("c", 99.0, 101.0, 102.0)
    val out = Analytic.exactMedian(
        rows.toDF("event_type", "value", "ts")).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("k"),
          r.getAs[Long]("median_cents")))
      .toMap
    assert(out("a") == (4L, 2L, 200L))
    assert(out("b") == (3L, 2L, 9900L))
    assert(out("c") == (3L, 2L, 10100L))
  }

  test("agg_exact_median: sf — the bucketed result equals the naive " +
      "sorted order statistic per group") {
    val got = Analytic.aggExactMedian(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Long]("median_cents")).toMap
    val naive = graft.Tables(spark, sfDir, "events")
      .select(col("event_type"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .collect().groupBy(_.getString(0))
      .map { case (t, rs) =>
        val s = rs.map(_.getLong(1)).sorted
        t -> s((s.length + 1) / 2 - 1)
      }
    assert(got == naive && got.nonEmpty)
  }

  test("events_streaks: planted islands — streak counts, longest, and " +
      "earliest-start tiebreak") {
    import spark.implicits._
    def d(u: Long, s: String) =
      (u, java.sql.Timestamp.valueOf(s + " 12:00:00"))
    val ev = Seq(
      d(1, "2024-01-01"), d(1, "2024-01-02"), d(1, "2024-01-03"),
      d(1, "2024-01-05"), d(1, "2024-01-10"), d(1, "2024-01-11"),
      d(1, "2024-01-01"), // duplicate day collapses
      d(2, "2024-02-01"), d(2, "2024-02-02"),
      d(2, "2024-02-10"), d(2, "2024-02-11"))
      .toDF("user_id", "ts")
    val out = Analytic.streaks(ev).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_active_days"), r.getAs[Long]("n_streaks"),
          r.getAs[Long]("longest_streak"),
          r.getAs[java.sql.Date]("longest_start").toString))
      .toMap
    assert(out(1L) == (6L, 3L, 3L, "2024-01-01"))
    // two equal-length streaks: the EARLIEST start reports
    assert(out(2L) == (4L, 2L, 2L, "2024-02-01"))
  }

  test("cohort_ltv: planted cohorts — curves, sizes, and floor-exact " +
      "per-customer LTV") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1L, ts("1995-01-05"), 10.0), (1L, ts("1995-02-07"), 20.0),
      (2L, ts("1995-01-20"), 30.0),
      (3L, ts("1995-02-01"), 40.0), (3L, ts("1995-04-01"), 5.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Analytic.ltvCurves(orders).collect()
      .map(r => (r.getAs[java.sql.Date]("cohort_month").toString,
        r.getAs[Long]("age")) ->
        (r.getAs[Long]("n_customers"), r.getAs[Long]("n_orders"),
          r.getAs[Long]("cents"), r.getAs[Long]("cum_cents"),
          r.getAs[Long]("ltv_cents")))
      .toMap
    assert(out(("1995-01-01", 0L)) == (2L, 2L, 4000L, 4000L, 2000L))
    assert(out(("1995-01-01", 1L)) == (2L, 1L, 2000L, 6000L, 3000L))
    assert(out(("1995-02-01", 0L)) == (1L, 1L, 4000L, 4000L, 4000L))
    assert(out(("1995-02-01", 2L)) == (1L, 1L, 500L, 4500L, 4500L))
    assert(out.size == 4)
  }

  test("cohort_ltv: sf invariants — cumulative monotone per cohort, " +
      "order/revenue totals conserve the orders table") {
    val rows = Analytic.cohortLtv(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalOrders = graft.Tables(spark, sfDir, "orders").count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == totalOrders)
    rows.groupBy(_.getAs[java.sql.Date]("cohort_month")).foreach {
      case (_, rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("age"))
        // cum is a running sum of cents and age-0 exists (the first
        // order defines the cohort)
        assert(sorted.head.getAs[Long]("age") == 0L)
        var cum = 0L
        sorted.foreach { r =>
          cum += r.getAs[Long]("cents")
          assert(r.getAs[Long]("cum_cents") == cum)
          assert(r.getAs[Long]("ltv_cents") ==
            cum / r.getAs[Long]("n_customers"))
        }
    }
  }

  test("ts_seasonal: a planted period-7 series decomposes exactly — " +
      "flat trend, recovered weekday effects, zero residual") {
    import spark.implicits._
    // 21 days from Monday 2024-01-01; value = $7.00 + e(dow), Σe = 0
    val e = Map(1 -> 7, 2 -> -7, 3 -> 14, 4 -> -14, 5 -> 21, 6 -> -21, 7 -> 0)
    val rows = (0 until 21).map { d =>
      val dow = d % 7 + 1
      ("s", new java.sql.Timestamp(1704067200000L + d * 86400000L),
        (700 + e(dow)) / 100.0)
    }
    val out = Analytic.seasonalDecompose(
        rows.toDF("event_type", "ts", "value"))
      .orderBy(col("day")).collect()
    assert(out.length == 21)
    out.zipWithIndex.foreach { case (r, i) =>
      val dow = r.getAs[Int]("dow")
      assert(dow == i % 7 + 1)
      // seasonal = e(dow)/100 for every day (dollar-scale effect)
      assert(r.getAs[Double]("seasonal") == e(dow) / 100.0)
      if (i >= 3 && i <= 17) { // full centered window
        assert(r.getAs[Double]("trend") == 7.0, s"day $i trend")
        assert(r.getAs[Double]("resid") == 0.0, s"day $i resid")
      } else {
        assert(r.isNullAt(r.fieldIndex("trend")), s"day $i edge trend")
        assert(r.isNullAt(r.fieldIndex("resid")), s"day $i edge resid")
      }
    }
  }

  test("ts_seasonal: gap guard + left join — windows straddling a " +
      "missing day report null trend, and days whose weekday has no " +
      "full window keep their rows with null seasonal") {
    import spark.implicits._
    val base = 1704067200000L // Monday 2024-01-01
    // type g: 15 consecutive days with the 8th (d=7) missing; a 7-ROW
    // frame that straddles the hole spans >6 calendar days
    val gRows = (0 until 15).filterNot(_ == 7).map { d =>
      ("g", new java.sql.Timestamp(base + d * 86400000L), 7.0)
    }
    // type s: 3 days only — no full window exists anywhere
    val sRows = (0 until 3).map { d =>
      ("s", new java.sql.Timestamp(base + d * 86400000L), 5.0)
    }
    val out = Analytic.seasonalDecompose(
      (gRows ++ sRows).toDF("event_type", "ts", "value")).collect()
    val g = out.filter(_.getAs[String]("event_type") == "g")
      .sortBy(_.getAs[java.sql.Date]("day").getTime)
    assert(g.length == 14) // nothing dropped by the seasonal join
    // the only 7-row frames with a 6-day span sit entirely on one side
    // of the hole: centered on day 3 (dow 4) and day 11 (dow 5)
    val trendDays = g.filter(!_.isNullAt(g.head.fieldIndex("trend")))
      .map(_.getAs[Int]("dow")).toSeq
    assert(trendDays == Seq(4, 5))
    g.foreach { r =>
      if (Set(4, 5)(r.getAs[Int]("dow")))
        assert(r.getAs[Double]("seasonal") == 0.0) // flat series
      else
        assert(r.isNullAt(r.fieldIndex("seasonal")),
          s"dow ${r.getAs[Int]("dow")} must carry null seasonal")
    }
    val s = out.filter(_.getAs[String]("event_type") == "s")
    assert(s.length == 3)
    assert(s.forall(r => r.isNullAt(r.fieldIndex("trend")) &&
      r.isNullAt(r.fieldIndex("seasonal")) &&
      r.isNullAt(r.fieldIndex("resid"))))
  }

  test("ts_seasonal: sf tables — every weekday gets one effect per type " +
      "and the decomposition reconstructs the observed series") {
    val rows = Analytic.tsSeasonal(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      // one seasonal value per dow, constant within (type, dow)
      val byDow = rs.groupBy(_.getAs[Int]("dow"))
        .view.mapValues(_.map(_.getAs[Double]("seasonal")).distinct).toMap
      assert(byDow.keySet == (1 to 7).toSet, s"$t dow coverage")
      assert(byDow.values.forall(_.size == 1), s"$t seasonal constant")
      rs.filter(r => !r.isNullAt(r.fieldIndex("resid"))).foreach { r =>
        val back = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
          r.getAs[Double]("resid")
        assert(math.abs(back - r.getAs[Double]("rev")) < 2e-4,
          s"$t ${r.getAs[java.sql.Date]("day")} reconstruct")
      }
    }
  }
  test("ts_backtest: the per-type report equals a local walk-forward " +
      "recomputation from ts_holt's own output") {
    val holt = Analytic.tsHolt(spark, sfDir).collect()
      .groupBy(_.getAs[String]("event_type"))
    val got = Analytic.tsBacktest(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.keySet == holt.keySet)
    holt.foreach { case (tpe, series) =>
      val byDay = series.sortBy(_.getAs[java.sql.Date]("day").toString)
      val evals = byDay.sliding(2).collect { case Array(a, b) =>
        val fc = math.round(a.getAs[Double]("forecast_next") * 100)
        val naive = math.round(a.getAs[Double]("rev") * 100)
        val next = math.round(b.getAs[Double]("rev") * 100)
        (math.abs(next - fc), math.abs(next - naive), next - fc)
      }.toSeq
      val r = got(tpe)
      assert(r.getAs[Long]("n_evals") == evals.length)
      assert(r.getAs[Long]("mae_holt_cents") ==
        evals.map(_._1).sum / evals.length)
      assert(r.getAs[Long]("mae_naive_cents") ==
        evals.map(_._2).sum / evals.length)
      assert(r.getAs[Long]("err_total_cents") == evals.map(_._3).sum)
      assert(r.getAs[Int]("holt_wins") ==
        (if (evals.map(_._1).sum / evals.length <=
          evals.map(_._2).sum / evals.length) 1 else 0))
    }
  }
}
