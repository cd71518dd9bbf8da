package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BitemporalSpec extends SparkSpec {

  private val T0 = 1704067200000000L // 2024-01-01T00:00:00Z µs
  private val Day = 86400000000L

  test("etl_bitemporal: a late-arriving event revises the as-of " +
      "answer; a late-arriving user is a late insert; on-time " +
      "history is silent") {
    import spark.implicits._
    // ids are ARRIVAL order; max id = 10 → Tx₁ = 4. max ts = T0+20 d
    // → Tv = T0+6 d. Valid-time events: everything at/under T0+6 d.
    val rows = Seq(
      // user 1: 'view' known at Tx₁; a late 'click' (id 9 > 4) with
      // earlier valid time inside Tv → REVISION view→click
      (1L, T0, 1L, "view"),
      (9L, T0 + Day, 1L, "click"),
      // user 2: whole history arrives late → LATE_INSERT
      (10L, T0, 2L, "signup"),
      // user 3: both events known at Tx₁ → not reported
      (2L, T0, 3L, "view"),
      (3L, T0 + Day, 3L, "click"),
      // filler beyond Tv: fixes max ts, never enters a state
      (4L, T0 + 15 * Day, 50L, "error"),
      (5L, T0 + 20 * Day, 50L, "error"),
      (6L, T0 + 10 * Day, 3L, "error"),
      (7L, T0 + 10 * Day, 3L, "error"),
      (8L, T0 + 10 * Day, 3L, "error"))
    val df = rows.toDF("event_id", "us", "user_id", "event_type")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val out = Relational.bitemporalCorrections(df).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (Option(r.getAs[String]("type_known_t1")),
          r.getAs[String]("type_known_t2"),
          r.getAs[String]("correction"))).toMap
    assert(out == Map(
      1L -> (Some("view"), "click", "revision"),
      2L -> (None, "signup", "late_insert")))
  }

  test("etl_bitemporal: sf invariants — corrections are a strict " +
      "subset of users, revisions really differ, and the report is " +
      "deterministic") {
    val a = Relational.etlBitemporal(spark, sfDir).collect()
    val b = Relational.etlBitemporal(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    val nUsers = graft.Tables(spark, sfDir, "events")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(a.length < nUsers)
    a.foreach { r =>
      val t1 = Option(r.getAs[String]("type_known_t1"))
      val c = r.getAs[String]("correction")
      assert((c == "late_insert") == t1.isEmpty)
      if (c == "revision")
        assert(t1.get != r.getAs[String]("type_known_t2"))
    }
  }
}
