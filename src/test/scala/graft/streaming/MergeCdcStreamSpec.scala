package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class MergeCdcStreamSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("MergeCdcStream: upserts, tombstones, stale replays, last-op-wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[CdcRecord]
    val q = MergeCdcStream.merged(mem.toDS())
      .writeStream.format("memory").queryName("cdc")
      .outputMode("append").start()
    try {
      // batch 1: fresh upserts for two keys
      mem.addData(
        CdcRecord(1L, ts("2024-01-01 10:00:00"), 1L, "U", 10.0),
        CdcRecord(2L, ts("2024-01-01 10:00:00"), 2L, "U", 20.0))
      q.processAllAvailable()
      val b1 = spark.sql("SELECT key, op, value FROM cdc")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(b1 == Set((1L, "U", 10.0), (2L, "U", 20.0)))

      // batch 2: delete key 1 (newer stamp) -> tombstone emitted;
      // STALE replay for key 2 (older stamp) -> no emission for key 2
      mem.addData(
        CdcRecord(1L, ts("2024-01-01 11:00:00"), 3L, "D", 0.0),
        CdcRecord(2L, ts("2024-01-01 09:00:00"), 0L, "U", 99.0))
      q.processAllAvailable()
      val b2 = spark.sql("SELECT key, op, value FROM cdc")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      assert(b2.count(_._1 == 1L) == 2, "delete must emit a tombstone")
      assert(b2.filter(_._1 == 1L).map(_._2).toSet == Set("U", "D"))
      assert(b2.count(_._1 == 2L) == 1, "stale replay must not re-emit")

      // batch 3: same-ts tiebreak on event_id — the higher id wins
      mem.addData(
        CdcRecord(3L, ts("2024-01-01 12:00:00"), 10L, "U", 1.0),
        CdcRecord(3L, ts("2024-01-01 12:00:00"), 11L, "U", 2.0))
      q.processAllAvailable()
      val k3 = spark.sql("SELECT value FROM cdc WHERE key = 3")
        .collect().map(_.getDouble(0))
      assert(k3.toSeq == Seq(2.0), "event_id tiebreak must pick the later op")
    } finally q.stop()
  }

  test("MergeCdcStream converges to the batch last-op-wins fold on a shuffled log") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a log with replays and out-of-order arrivals across batches
    val log = Seq(
      CdcRecord(1L, ts("2024-01-01 10:00:00"), 1L, "U", 1.0),
      CdcRecord(1L, ts("2024-01-01 10:30:00"), 2L, "U", 1.5),
      CdcRecord(1L, ts("2024-01-01 10:15:00"), 5L, "D", 0.0), // late, loses
      CdcRecord(2L, ts("2024-01-01 10:10:00"), 3L, "U", 2.0),
      CdcRecord(2L, ts("2024-01-01 10:20:00"), 4L, "D", 0.0), // delete wins
      CdcRecord(3L, ts("2024-01-01 10:05:00"), 6L, "U", 3.0))
    val mem = MemoryStream[CdcRecord]
    val q = MergeCdcStream.merged(mem.toDS())
      .writeStream.format("memory").queryName("cdc2")
      .outputMode("append").start()
    try {
      log.grouped(2).foreach { batch =>
        mem.addData(batch: _*); q.processAllAvailable()
      }
      // last emission per key == the batch fold's winner
      val last = spark.sql(
        """SELECT key, op, value FROM (
          |  SELECT *, row_number() OVER (PARTITION BY key
          |    ORDER BY ts DESC, event_id DESC) AS rn FROM cdc2) WHERE rn = 1
          |""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      val expect = log.groupBy(_.key).map { case (k, xs) =>
        val w = xs.maxBy(r => (r.ts.getTime, r.event_id))
        (k, if (w.op == "D") "D" else "U", w.new_value)
      }.toSet
      assert(last == expect)
    } finally q.stop()
  }
}
