package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowCountsTransform runs as a real stream with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")

    val q = Streaming.windowCountsTransform(events)
      .writeStream.format("memory").queryName("wc")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:45:00"), "click", 2.0),
        (ts("2024-01-01 11:10:00"), "view", 5.0))
      q.processAllAvailable()
      // advance watermark far enough to close the 10:00 and 11:00 windows
      mem.addData((ts("2024-01-01 15:00:00"), "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT event_type, n_events, sum_value FROM wc ORDER BY window_start")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq == Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("batch and streaming window counts agree on the same input") {
    import spark.implicits._
    val batch = Seq(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:45:00"), "click", 2.0),
      (ts("2024-01-01 11:10:00"), "view", 5.0)
    ).toDF("ts", "event_type", "value")
    val got = Streaming.windowCountsTransform(batch)
      .orderBy("window_start", "event_type")
      .select("event_type", "n_events", "sum_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("stream_topk: foreachBatch rank over streamed window counts " +
    "matches the batch path") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = Streaming.windowCountsTransform(events)
      .writeStream.format("memory").queryName("wc_topk")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:01:00"), "click", 1.0),
        (ts("2024-01-01 10:02:00"), "click", 1.0),
        (ts("2024-01-01 10:03:00"), "view", 1.0),
        (ts("2024-01-01 10:04:00"), "view", 1.0),
        (ts("2024-01-01 10:05:00"), "view", 1.0),
        (ts("2024-01-01 10:06:00"), "error", 1.0),
        (ts("2024-01-01 10:07:00"), "signup", 1.0))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 15:00:00"), "click", 1.0))
      q.processAllAvailable()
      val streamed = Streaming.topkPerWindow(spark.table("wc_topk"))
        .orderBy(col("window_start"), col("rk"))
        .collect().map(r => (r.getString(1), r.getLong(2), r.getInt(3)))
      // closed 10:00 window: view(3) > click(2) > error/signup(1, tie
      // broken by name)
      assert(streamed.take(3).toSeq ==
        Seq(("view", 3L, 1), ("click", 2L, 2), ("error", 1L, 3)))
    } finally q.stop()
  }

  test("SessionizeStream closes sessions on gap and on watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = SessionizeStream.sessions(mem.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // burst 1: two events 5 min apart; burst 2 same batch: 40 min
      // later (> 30-min gap) → first session closes in-batch
      mem.addData(
        SessionEvent(7L, ts("2024-01-01 10:00:00"), 1.0),
        SessionEvent(7L, ts("2024-01-01 10:05:00"), 2.0),
        SessionEvent(7L, ts("2024-01-01 10:45:00"), 4.0))
      q.processAllAvailable()
      val afterBatch = spark.sql(
        "SELECT n_events, session_value FROM sessions")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(afterBatch == Set((2L, 3.0)))

      // advance the watermark far past 10:45 + gap → timeout flushes
      // the open session (another user's event drives the clock)
      mem.addData(SessionEvent(99L, ts("2024-01-01 13:00:00"), 0.5))
      q.processAllAvailable()
      mem.addData(SessionEvent(99L, ts("2024-01-01 15:00:00"), 0.5))
      q.processAllAvailable()

      val all = spark.sql(
        """SELECT user_id, n_events, session_value FROM sessions
          |WHERE user_id = 7 ORDER BY session_value""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(all.toSeq == Seq((7L, 2L, 3.0), (7L, 1L, 4.0)))
    } finally q.stop()
  }

  test("SessionizeStream: cross-batch late event extends bounds, never shrinks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = SessionizeStream.sessions(mem.toDS())
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode("append").start()
    try {
      // batch 1: session [10:00, 10:20]; watermark (delay 10m) → 10:10
      mem.addData(
        SessionEvent(7L, ts("2024-01-01 10:00:00"), 1.0),
        SessionEvent(7L, ts("2024-01-01 10:20:00"), 2.0))
      q.processAllAvailable()
      // batch 2: LATE but within-watermark event at 10:12 — must merge
      // into the open session without moving session_end backwards
      // (the old negative-gap merge set session_end=10:12, so the
      // timeout fired at 10:42 and fragmented the session).
      mem.addData(SessionEvent(7L, ts("2024-01-01 10:12:00"), 4.0))
      q.processAllAvailable()
      // a fresh in-gap event at 10:30 must still merge (session alive)
      mem.addData(SessionEvent(7L, ts("2024-01-01 10:30:00"), 8.0))
      q.processAllAvailable()
      // advance watermark far past 10:30+gap → flush
      mem.addData(SessionEvent(99L, ts("2024-01-01 13:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData(SessionEvent(99L, ts("2024-01-01 15:00:00"), 0.0))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT session_start, session_end, n_events, session_value
          |FROM late_sessions WHERE user_id = 7""".stripMargin)
        .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSeq == Seq(
        (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"), 4L, 15.0)))
    } finally q.stop()
  }

  test("streaming sessionize agrees with the batch sessionize gap rule") {
    import spark.implicits._
    // batch operator (B16) on the same tiny input
    val batch = Seq(
      (7L, ts("2024-01-01 10:00:00"), 1.0),
      (7L, ts("2024-01-01 10:05:00"), 2.0),
      (7L, ts("2024-01-01 10:45:00"), 4.0)
    ).toDF("user_id", "ts", "value")
      .withColumn("event_id", org.apache.spark.sql.functions.monotonically_increasing_id())
    batch.createOrReplaceTempView("__sess_events")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts")
    import org.apache.spark.sql.functions._
    val sessions = batch
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("is_new", when($"prev_ts".isNull ||
        unix_micros($"ts") - unix_micros($"prev_ts") > 1800000000L, 1L)
        .otherwise(0L))
      .withColumn("session_id", sum($"is_new").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
      .select($"n", $"v").as[(Long, Double)].collect().toSet
    assert(sessions == Set((2L, 3.0), (1L, 4.0)))
  }

  test("streaming HLL sketch maintenance merges to the batch estimate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.HllSketch._
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = Streaming.sketchMaintenanceTransform(
      mem.toDF().toDF("user_id", "ts", "event_type"))
      .writeStream.format("memory").queryName("sketch_stream")
      .outputMode("complete").start()
    try {
      // two micro-batches, overlapping users across windows and types
      mem.addData(
        (1L, ts("2024-01-01 10:05:00"), "view"),
        (2L, ts("2024-01-01 10:10:00"), "view"),
        (1L, ts("2024-01-01 11:05:00"), "view"),
        (3L, ts("2024-01-01 10:20:00"), "purchase"))
      q.processAllAvailable()
      mem.addData(
        (2L, ts("2024-01-01 11:30:00"), "view"),
        (4L, ts("2024-01-01 10:40:00"), "view"),
        (3L, ts("2024-01-01 11:45:00"), "purchase"))
      q.processAllAvailable()
      val partials = spark.table("sketch_stream")
      // one partial per (window, type) that saw data
      assert(partials.count() == 4)
      // periodic rollup: merging the stream-built partials per type
      // must equal the batch estimate over the same rows — register
      // max is associative and idempotent, so EXACT equality holds
      val merged = partials.groupBy($"event_type")
        .agg(hllEstimate(hllMerge($"sk")).as("est"))
        .as[(String, Long)].collect().toMap
      val batch = Seq(
        (1L, "view"), (2L, "view"), (1L, "view"), (3L, "purchase"),
        (2L, "view"), (4L, "view"), (3L, "purchase"))
        .toDF("user_id", "event_type")
        .groupBy($"event_type")
        .agg(hllEstimate(hllAgg($"user_id")).as("est"))
        .as[(String, Long)].collect().toMap
      assert(merged == batch, s"stream-merged $merged != batch $batch")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark drops re-deliveries of the same key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = Streaming.dedupStreamTransform(
      mem.toDF().toDF("event_id", "ts", "value"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), 1.0),
        (1L, ts("2024-01-01 10:00:05"), 1.0), // same-batch re-delivery
        (2L, ts("2024-01-01 10:01:00"), 2.0))
      q.processAllAvailable()
      // next batch: another re-delivery of key 1 within the 1h horizon
      mem.addData((1L, ts("2024-01-01 10:30:00"), 1.0),
        (3L, ts("2024-01-01 10:31:00"), 3.0))
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_stream")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(ids == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("CorpusStream intake: dedups re-deliveries and gates quality live") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 120 tokens, stopword ratio 1/3 — inside the quality gate
    val good = (1 to 40).map(i => s"word$i alpha$i the").mkString(" ")
    val short = "too short"
    val mem = MemoryStream[(Long, Timestamp, String)]
    val q = CorpusStream.intake(
      mem.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("corpus_intake")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, ts("2024-01-01 10:00:00"), good),
        (1L, ts("2024-01-01 10:00:05"), good),  // re-delivery: dropped
        (2L, ts("2024-01-01 10:01:00"), short)) // fails the gate
      q.processAllAvailable()
      mem.addData((3L, ts("2024-01-01 10:02:00"), good))
      q.processAllAvailable()
      val rows = spark.sql(
        """SELECT doc_id, n_tokens, qc_score_int, qc_keep
          |FROM corpus_intake ORDER BY doc_id""".stripMargin)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)))
      assert(rows.map(_._1).toSeq == Seq(1L, 3L))
      rows.foreach { case (_, n, scoreInt, keep) =>
        assert(n >= graft.etl.CorpusPipeline.MinTokens)
        // the C27 score rides along and its gate is the integer sign —
        // same contract as the batch quality_classifier query
        assert(keep == (if (scoreInt >= 0) 1 else 0))
      }
    } finally q.stop()
  }

  test("attribution interval join runs stream-stream with bounded state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val q = Streaming.attributionJoinTransform(
      views.toDF().toDF("user_id", "event_id", "ts"),
      clicks.toDF().toDF("user_id", "event_id", "ts"))
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      views.addData((7L, 100L, ts("2024-01-01 10:00:00")))
      clicks.addData(
        (7L, 200L, ts("2024-01-01 10:10:00")), // within 30 min → pair
        (7L, 201L, ts("2024-01-01 10:50:00")), // past horizon → no pair
        (8L, 202L, ts("2024-01-01 10:10:00"))) // other user → no pair
      q.processAllAvailable()
      // advance both watermarks so results finalize
      views.addData((99L, 900L, ts("2024-01-01 15:00:00")))
      clicks.addData((99L, 901L, ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      val pairs = spark.sql(
        "SELECT user_id, view_id, click_id FROM attrib WHERE user_id = 7")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(pairs.toSeq == Seq((7L, 100L, 200L)))
    } finally q.stop()
  }

  test("batch and streaming attribution join agree on the same input") {
    import spark.implicits._
    val vs = Seq((7L, 100L, ts("2024-01-01 10:00:00")),
      (7L, 101L, ts("2024-01-01 10:20:00")))
      .toDF("user_id", "event_id", "ts")
    val cs = Seq((7L, 200L, ts("2024-01-01 10:25:00")),
      (7L, 201L, ts("2024-01-01 11:00:00")),
      (9L, 202L, ts("2024-01-01 10:25:00")))
      .toDF("user_id", "event_id", "ts")
    val got = Streaming.attributionJoinTransform(vs, cs)
      .select("view_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 10:25 click matches both open views; 11:00 click matches neither
    assert(got == Set((100L, 200L), (101L, 200L)))
  }

  test("win_hopping's aggregation is streaming-legal under a watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    // the exact win_hopping shape: 1h windows / 15min hops + watermark
    val q = events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"))
      .writeStream.format("memory").queryName("hop")
      .outputMode("append").start()
    try {
      mem.addData((ts("2024-01-01 10:05:00"), "click", 1.0))
      q.processAllAvailable()
      mem.addData((ts("2024-01-01 15:00:00"), "late", 1.0)) // close windows
      q.processAllAvailable()
      val starts = spark.sql(
        "SELECT window_start FROM hop WHERE event_type = 'click'")
        .collect().map(_.getTimestamp(0).toString).sorted
      // duration/slide = 4 overlapping windows contain 10:05
      assert(starts.toSeq == Seq("2024-01-01 09:15:00.0",
        "2024-01-01 09:30:00.0", "2024-01-01 09:45:00.0",
        "2024-01-01 10:00:00.0"))
    } finally q.stop()
  }

  test("AnomalyStream alarms only outside the trailing-mean band") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KeyedCount]
    val q = AnomalyStream.anomalies(mem.toDS())
      .writeStream.format("memory").queryName("anomalies")
      .outputMode("append").start()
    try {
      // 3 quiet days build the baseline (no alarms possible yet)
      mem.addData(
        KeyedCount("view", "2024-01-01", 100),
        KeyedCount("view", "2024-01-02", 110),
        KeyedCount("view", "2024-01-03", 90))
      q.processAllAvailable()
      // day 4 in-band (no alarm), day 5 flood (alarm), day 6 collapse
      mem.addData(KeyedCount("view", "2024-01-04", 120))
      q.processAllAvailable()
      mem.addData(KeyedCount("view", "2024-01-05", 500))
      q.processAllAvailable()
      mem.addData(KeyedCount("view", "2024-01-06", 10))
      q.processAllAvailable()

      val rows = spark.sql("SELECT day, n, ratio FROM anomalies")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("2024-01-05", 500L), ("2024-01-06", 10L)))
      // flood enters the trailing window: day-6 baseline includes 500
      val r6 = spark.sql("SELECT baseline FROM anomalies WHERE day = '2024-01-06'")
        .collect()(0).getDouble(0)
      assert(r6 > 120.0, s"day-6 baseline $r6 must include the flood")
    } finally q.stop()
  }

  test("AnomalyStream agrees with its own rule replayed in batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val days = (1 to 20).map(i => KeyedCount("e", f"2024-01-$i%02d",
      if (i % 7 == 0) 400 else 95 + i))
    val mem = MemoryStream[KeyedCount]
    val q = AnomalyStream.anomalies(mem.toDS())
      .writeStream.format("memory").queryName("anomalies2")
      .outputMode("append").start()
    try {
      days.grouped(3).foreach { batch => // arbitrary batch boundaries
        mem.addData(batch: _*); q.processAllAvailable()
      }
      val streamed = spark.sql("SELECT day FROM anomalies2")
        .collect().map(_.getString(0)).toSet
      // replay sequentially (the batch-of-record rule)
      var hist = List.empty[Double]
      val expected = Set.newBuilder[String]
      days.foreach { d =>
        if (hist.size >= AnomalyStream.MinBaseline) {
          val base = hist.sum / hist.size
          val ratio = d.n / base
          if (ratio > AnomalyStream.MaxRatio ||
            ratio < 1.0 / AnomalyStream.MaxRatio) expected += d.day
        }
        hist = (d.n.toDouble :: hist).take(AnomalyStream.Trail)
      }
      assert(streamed == expected.result(),
        "stream (any batching) must equal the sequential rule")
    } finally q.stop()
  }

  test("DeltaAlertStream emits new/changed alerts only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KeyedValue]
    val q = DeltaAlertStream.alerts(mem.toDS())
      .writeStream.format("memory").queryName("alerts")
      .outputMode("append").start()
    try {
      mem.addData(
        KeyedValue("a", 1.0, ts("2024-01-01 00:00:00")),
        KeyedValue("b", 2.0, ts("2024-01-01 00:00:01")))
      q.processAllAvailable()
      mem.addData(
        KeyedValue("a", 1.0, ts("2024-01-02 00:00:00")), // unchanged
        KeyedValue("b", 9.0, ts("2024-01-02 00:00:01")), // changed
        KeyedValue("c", 3.0, ts("2024-01-02 00:00:02"))) // new
      q.processAllAvailable()

      val rows = spark.sql("SELECT key, kind, new_value FROM alerts")
        .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(rows == Set(
        ("a", "new", 1.0), ("b", "new", 2.0),
        ("b", "changed", 9.0), ("c", "new", 3.0)))
    } finally q.stop()
  }

  test("DeltaAlertStream.deliver: one digest per non-empty micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sent = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]
    val sink = new graft.etl.AlertSink {
      override def send(subject: String, body: String): Unit =
        sent.add((subject, body))
    }
    val mem = MemoryStream[KeyedValue]
    val q = DeltaAlertStream.deliver(
      DeltaAlertStream.alerts(mem.toDS()), sink).start()
    try {
      mem.addData(KeyedValue("a", 1.0, ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      mem.addData(KeyedValue("a", 1.0, ts("2024-01-02 00:00:00"))) // no delta
      q.processAllAvailable()
      mem.addData(KeyedValue("a", 5.0, ts("2024-01-03 00:00:00")))
      q.processAllAvailable()
      val msgs = sent.toArray(Array.empty[(String, String)]).toSeq
      // exactly 2 deliveries: the unchanged batch must NOT send
      assert(msgs.size == 2)
      assert(msgs.head._1.startsWith("ALERT: 1 delta"))
      assert(msgs.head._2.contains("""<div class="card"><h2>a</h2>"""))
      assert(msgs(1)._2.contains("<p>kind: changed</p>") &&
        msgs(1)._2.contains("<p>new_value: 5.0</p>"))
    } finally q.stop()
  }

  test("ForecastStream: a dipping series drives the trend negative " +
      "through the exact floor recurrence") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DailyCents]
    val q = ForecastStream.forecasts(mem.toDS())
      .writeStream.format("memory").queryName("fc1")
      .outputMode("append").start()
    try {
      mem.addData(DailyCents("a", "2024-01-01", 10000),
        DailyCents("a", "2024-01-02", 8000))
      q.processAllAvailable()
      mem.addData(DailyCents("a", "2024-01-03", 6000))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT day, level, trend, forecastNext FROM fc1 ORDER BY day")
        .collect()
      // hand fold: l1=10000,t1=0; l2=⌊(5·8000+5·10000)/10⌋=9000,
      // t2=⌊3·(9000−10000)/10⌋=⌊−3000/10⌋=−300;
      // l3=⌊(5·6000+5·(9000−300))/10⌋=⌊73500/10⌋=7350,
      // t3=⌊(3·(7350−9000)+7·(−300))/10⌋=⌊−7050/10⌋=−705
      assert(rows.map(_.getDouble(1)).toSeq ==
        Seq(100.0, 90.0, 73.5))
      assert(rows.map(_.getDouble(2)).toSeq ==
        Seq(0.0, -3.0, -7.05))
      assert(rows.last.getDouble(3) == 73.5 - 7.05)
    } finally q.stop()
  }

  test("ForecastStream drops replayed/late days instead of corrupting " +
      "the fold state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[DailyCents]
    val q = ForecastStream.forecasts(mem.toDS())
      .writeStream.format("memory").queryName("fc3")
      .outputMode("append").start()
    try {
      mem.addData(DailyCents("a", "2024-01-01", 10000),
        DailyCents("a", "2024-01-02", 8000))
      q.processAllAvailable()
      // a replay of day 2 and a late day 1 arrive before day 3: both
      // must be dropped, and day 3 must fold exactly as if they never
      // came (same state as the clean fc1 sequence → level 73.5)
      mem.addData(DailyCents("a", "2024-01-02", 99999),
        DailyCents("a", "2024-01-01", 12345))
      q.processAllAvailable()
      mem.addData(DailyCents("a", "2024-01-03", 6000))
      q.processAllAvailable()
      val rows = spark.sql("SELECT day, level FROM fc3 ORDER BY day, level")
        .collect().map(r => (r.getString(0), r.getDouble(1)))
      assert(rows.toSeq ==
        Seq(("2024-01-01", 100.0), ("2024-01-02", 90.0),
          ("2024-01-03", 73.5)),
        s"late rows must neither emit nor perturb the fold: ${rows.toSeq}")
    } finally q.stop()
  }

  test("ChangepointStream: stable stays quiet, a doubled level alarms " +
      "once and re-arms; stream equals the sequential replay under " +
      "any batching") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 7 warmup days at 10/day (T0 = 70), 5 stable days, then a
    // sustained doubling to 20/day
    val days = (1 to 12).map(i => KeyedCount("e", f"2024-01-$i%02d", 10)) ++
      (13 to 25).map(i => KeyedCount("e", f"2024-01-$i%02d", 20))
    val mem = MemoryStream[KeyedCount]
    val q = ChangepointStream.cusum(mem.toDS())
      .writeStream.format("memory").queryName("cusum1")
      .outputMode("append").start()
    try {
      days.grouped(4).foreach { b => // awkward batch boundaries
        mem.addData(b: _*); q.processAllAvailable()
      }
      val rows = spark.sql("SELECT day, n, sPos, alarm FROM cusum1")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getInt(3))).sortBy(_._1)
      // stable post-warmup days: dev = 70-70 = 0 < slack → S+ stays 0
      rows.filter(r => r._1 > "2024-01-07" && r._1 <= "2024-01-12")
        .foreach(r => assert(r._3 == 0L && r._4 == 0))
      // doubled: dev = 140-70 = 70, slack 35 → +35/day; H = 280 →
      // first alarm on the 9th doubled day (9*35 = 315 > 280)
      val alarms = rows.filter(_._4 == 1).map(_._1)
      assert(alarms.nonEmpty, "sustained doubling must alarm")
      assert(alarms.head == "2024-01-21",
        s"alarm expected on the 9th doubled day, got $alarms")
      // replay the fold sequentially and compare every row
      var (warmLeft, warmSum, t0, sp, sn) = (7, 0L, 0L, 0L, 0L)
      val expected = days.map { d =>
        if (warmLeft > 0) {
          warmLeft -= 1; warmSum += d.n
          if (warmLeft == 0) t0 = warmSum
          (d.day, d.n, 0L, 0)
        } else {
          val dev = 7 * d.n - t0
          val spN = math.max(0L, sp + dev - t0 / 2)
          val snN = math.max(0L, sn - dev - t0 / 2)
          val al = if (spN > 4 * t0 || snN > 4 * t0) 1 else 0
          sp = if (al == 1) 0L else spN
          sn = if (al == 1) 0L else snN
          (d.day, d.n, spN, al)
        }
      }
      assert(rows.toSeq == expected,
        "stream under arbitrary batching must equal the sequential fold")
    } finally q.stop()
  }

  test("ForecastStream equals the batch ts_holt fold on the sf series, " +
      "under arbitrary batch boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val daily = graft.Tables(spark, sfDir, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")) * 100, 0).cast("long").as("cents"))
      .collect()
      .map(r => DailyCents(r.getString(0), r.getDate(1).toString,
        r.getLong(2)))
      .sortBy(d => (d.day, d.key)) // stream arrives in day order
    val mem = MemoryStream[DailyCents]
    val q = ForecastStream.forecasts(mem.toDS())
      .writeStream.format("memory").queryName("fc2")
      .outputMode("append").start()
    try {
      daily.grouped(13).foreach { b => // awkward batch size on purpose
        mem.addData(b: _*); q.processAllAvailable()
      }
      val streamed = spark.sql(
        "SELECT key, day, level, trend, forecastNext FROM fc2")
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
      val batch = graft.operators.Analytic.tsHolt(spark, sfDir).collect()
        .map(r => (r.getString(0), r.getDate(1).toString) ->
          (r.getAs[Double]("level"), r.getAs[Double]("trend"),
            r.getAs[Double]("forecast_next"))).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (k, v) =>
        assert(v == batch(k), s"stream/batch mismatch at $k: $v vs ${batch(k)}")
      }
    } finally q.stop()
  }
}
