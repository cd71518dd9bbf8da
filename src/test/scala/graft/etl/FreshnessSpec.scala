package graft.etl

import java.sql.Timestamp

import graft.SparkSpec

class FreshnessSpec extends SparkSpec {

  private def events(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    // (type, seconds offset)
    rows.map { case (t, sec) =>
      (t, new Timestamp(1704067200000L + sec * 1000L))
    }.toDF("event_type", "ts")
  }

  test("freshness: a feed beyond the 24h SLA flags stale, the newest " +
      "feed is the zero-lag anchor") {
    val h = 3600L
    val rows = Seq(
      ("live", 0L), ("live", 48 * h),       // defines the corpus max
      ("lagging", 30 * h),                  // 18 h behind — fresh
      ("stalled", 10 * h))                  // 38 h behind — stale
    val out = Etl.freshness(events(rows)).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("live").getAs[Long]("lag_us") == 0L)
    assert(out("live").getAs[Int]("stale") == 0)
    assert(out("lagging").getAs[Long]("lag_us") == 18 * h * 1000000L)
    assert(out("lagging").getAs[Int]("stale") == 0)
    assert(out("stalled").getAs[Long]("lag_us") == 38 * h * 1000000L)
    assert(out("stalled").getAs[Int]("stale") == 1)
    assert(out("live").getAs[Long]("n_events") == 2L)
  }

  test("freshness: boundary lag of exactly 24h is NOT stale (strict >)") {
    val rows = Seq(("a", 86400L), ("b", 0L))
    val out = Etl.freshness(events(rows)).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out("b").getAs[Long]("lag_us") == Etl.FreshnessSlaUs)
    assert(out("b").getAs[Int]("stale") == 0,
      "SLA boundary must not flag — the flag is strictly greater-than")
  }
}
