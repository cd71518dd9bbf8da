package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SubjectExportSpec extends SparkSpec {

  private def u16(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(2)
        .map("%02x".format(_)).mkString, 16)

  test("etl_subject_export: planted users — only the salted-draw " +
      "cohort exports, with exact inventory and fingerprint") {
    import spark.implicits._
    // uid 1 is inside the sx: selection at the 8192 bound, uid 0 is
    // outside (pinned here so a threshold change fails loudly)
    assert(u16("sx:1") < Etl.SubjectThresh)
    assert(u16("sx:0") >= Etl.SubjectThresh)
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1L, "click", 1.5),
      (11L, ts("2024-01-02 10:00:00"), 1L, "purchase", 20.25),
      (12L, ts("2024-01-03 10:00:00"), 1L, "click", 0.0),
      (13L, ts("2024-01-01 09:00:00"), 0L, "view", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Etl.subjectExport(ev).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("user_id") == 1L)
    assert(r.getAs[Long]("n_events") == 3L)
    assert(r.getAs[Timestamp]("first_ts") == ts("2024-01-01 10:00:00"))
    assert(r.getAs[Timestamp]("last_ts") == ts("2024-01-03 10:00:00"))
    assert(r.getAs[Long]("value_cents") == 150L + 2025L)
    assert(r.getAs[Long]("n_click") == 2L)
    assert(r.getAs[Long]("n_purchase") == 1L)
    assert(r.getAs[Long]("n_view") == 0L)
    val expFp = java.security.MessageDigest.getInstance("MD5")
      .digest("10,11,12".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getAs[String]("events_fp") == expFp)
  }

  test("etl_subject_export: sf invariants — type counts sum to the " +
      "total, spans ordered, cohort matches the draw") {
    val rows = Etl.etlSubjectExport(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val typed = Seq("n_click", "n_error", "n_purchase", "n_signup",
        "n_view").map(r.getAs[Long]).sum
      assert(typed == r.getAs[Long]("n_events"))
      assert(!r.getAs[Timestamp]("first_ts")
        .after(r.getAs[Timestamp]("last_ts")))
      assert(u16(s"sx:${r.getAs[Long]("user_id")}") < Etl.SubjectThresh)
    }
    // the cohort is ≈ SubjectThresh/65536 of users — never the table
    val users = graft.Tables(spark, sfDir, "events")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(rows.length < users / 2)
  }
}
