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
}
