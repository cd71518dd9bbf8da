package graft.etl

import java.nio.file.Files
import java.util.zip.ZipFile

import graft.SparkSpec

class DailyPipelineSpec extends SparkSpec {

  private def card(id: Int, title: String, country: String,
      premium: String, applicants: String, duration: String): String =
    s"""<div class="card"><h2>$title</h2>
       |<p>id: $id</p><p>country: $country</p><p>premium: $premium</p>
       |<p>applicants: $applicants</p><p>duration: $duration</p>
       |<p>organization: org$id</p></div>""".stripMargin

  private def sheet(path: String): String = {
    val zf = new ZipFile(path)
    try new String(zf.getInputStream(
      zf.getEntry("xl/worksheets/sheet1.xml")).readAllBytes(), "UTF-8")
    finally zf.close()
  }

  test("two-day run: rotation, delta, reports, conditional alert") {
    val root = Files.createTempDirectory("daily")
    val day1 = root.resolve("day1"); Files.createDirectories(day1)
    val day2 = root.resolve("day2"); Files.createDirectories(day2)
    val store = root.resolve("store").toString
    val reports = root.resolve("reports").toString

    Files.writeString(day1.resolve("page.html"),
      card(1, "Intern A", "de", "Yes", "12 applicants", "6 weeks") +
        card(2, "Intern B", "eg", "No", "3 applicants", "."))

    val r1 = DailyPipeline.run(spark, day1.toString, store, "2026-08-11", reports)
    // first run: everything is new
    assert(r1.nToday == 2 && r1.nNew == 2)
    assert(r1.alert.contains("ALERT: 2 new records in 2026-08-11"))

    // normalization rules: "." -> N/A, applicant parsing, case rules
    val t1 = sheet(r1.todayReport)
    assert(t1.contains("N/A"))          // duration null-token rule
    assert(t1.contains("<v>12</v>"))    // parsed applicant count
    assert(t1.contains("DE"))           // upper-cased country
    assert(t1.contains("""s="2""""))    // premium row highlighted

    Files.writeString(day2.resolve("page.html"),
      card(1, "Intern A", "de", "Yes", "15 applicants", "6 weeks") +
        card(2, "Intern B", "eg", "No", "4 applicants", ".") +
        card(3, "Intern C", "fr", "Yes", "1 applicant", "8 weeks"))

    val r2 = DailyPipeline.run(spark, day2.toString, store, "2026-08-12", reports)
    // only the genuinely-new key alerts (values changed on 1 and 2,
    // but the reference's New.xlsx is keyed on id presence)
    assert(r2.nToday == 3 && r2.nNew == 1)
    assert(r2.alert.contains("ALERT: 1 new records in 2026-08-12"))
    assert(r2.newReport.isDefined)
    val n2 = sheet(r2.newReport.get)
    assert(n2.contains("Intern C") && !n2.contains("Intern A"))

    // third day with no changes: no alert, no New.xlsx
    val day3 = root.resolve("day3"); Files.createDirectories(day3)
    Files.writeString(day3.resolve("page.html"),
      card(1, "Intern A", "de", "Yes", "15 applicants", "6 weeks") +
        card(2, "Intern B", "eg", "No", "4 applicants", ".") +
        card(3, "Intern C", "fr", "Yes", "1 applicant", "8 weeks"))
    val r3 = DailyPipeline.run(spark, day3.toString, store, "2026-08-13", reports)
    assert(r3.nNew == 0 && r3.alert.isEmpty && r3.newReport.isEmpty)
    // 2 -> 3 -> 3 rows: every day inside the volume band
    assert(r2.volumeAlarm.isEmpty && r3.volumeAlarm.isEmpty)
  }

  test("volume monitor: flood and collapse days alarm, steady days " +
      "and the first run stay quiet") {
    val root = Files.createTempDirectory("dailyv")
    val store = root.resolve("store").toString
    val reports = root.resolve("reports").toString
    def day(name: String, n: Int): String = {
      val d = root.resolve(name); Files.createDirectories(d)
      Files.writeString(d.resolve("page.html"),
        (1 to n).map(i =>
          card(i, s"T$i", "de", "No", s"$i applicants", "6 weeks"))
          .mkString)
      d.toString
    }
    val r1 = DailyPipeline.run(spark, day("d1", 1), store, "v1", reports)
    assert(r1.volumeAlarm.isEmpty, "no previous snapshot, no baseline")
    val r2 = DailyPipeline.run(spark, day("d2", 3), store, "v2", reports)
    assert(r2.volumeAlarm.exists(_.contains("3 rows vs previous 1")),
      s"3x flood must alarm: ${r2.volumeAlarm}")
    val r3 = DailyPipeline.run(spark, day("d3", 3), store, "v3", reports)
    assert(r3.volumeAlarm.isEmpty, "steady volume must stay quiet")
    val r4 = DailyPipeline.run(spark, day("d4", 1), store, "v4", reports)
    assert(r4.volumeAlarm.exists(_.contains("1 rows vs previous 3")),
      s"collapse must alarm: ${r4.volumeAlarm}")
  }

  test("freshness gate: stale baseline and replayed version alarm, " +
      "consecutive days and ad-hoc version ids stay quiet") {
    val root = Files.createTempDirectory("dailyf")
    val store = root.resolve("store").toString
    val reports = root.resolve("reports").toString
    def day(name: String): String = {
      val d = root.resolve(name); Files.createDirectories(d)
      Files.writeString(d.resolve("page.html"),
        card(1, "T1", "de", "No", "1 applicants", "6 weeks"))
      d.toString
    }
    val r1 = DailyPipeline.run(spark, day("d1"), store, "2026-08-01", reports)
    assert(r1.freshnessAlarm.isEmpty, "first run has no baseline")
    val r2 = DailyPipeline.run(spark, day("d2"), store, "2026-08-02", reports)
    assert(r2.freshnessAlarm.isEmpty, "consecutive day is fresh")
    val r3 = DailyPipeline.run(spark, day("d3"), store, "2026-08-06", reports)
    assert(r3.freshnessAlarm.exists(_.contains("4 days behind")),
      s"4-day gap must alarm: ${r3.freshnessAlarm}")
    val r4 = DailyPipeline.run(spark, day("d4"), store, "2026-08-05", reports)
    assert(r4.freshnessAlarm.exists(_.contains("not newer")),
      s"replayed/out-of-order version must alarm: ${r4.freshnessAlarm}")
    // ad-hoc version ids opt out of the gate entirely
    val store2 = root.resolve("store2").toString
    val a1 = DailyPipeline.run(spark, day("d5"), store2, "v1", reports)
    val a2 = DailyPipeline.run(spark, day("d6"), store2, "v9", reports)
    assert(a1.freshnessAlarm.isEmpty && a2.freshnessAlarm.isEmpty)
  }

  test("shift monitor: a level jump after warmup alarms through the " +
      "run-log CUSUM; the stable warmup stays quiet") {
    val root = Files.createTempDirectory("dailys")
    val store = root.resolve("store").toString
    val reports = root.resolve("reports").toString
    def day(name: String, n: Int): String = {
      val d = root.resolve(name); Files.createDirectories(d)
      Files.writeString(d.resolve("page.html"),
        (1 to n).map(i =>
          card(i, s"T$i", "de", "No", s"$i applicants", "6 weeks"))
          .mkString)
      d.toString
    }
    // 7 warmup days + 1 in-band day at n=3: T0 = 21, H = 84
    val quiet = (1 to 8).map { i =>
      DailyPipeline.run(spark, day(s"d$i", 3), store,
        f"2026-07-$i%02d", reports)
    }
    quiet.foreach(r => assert(r.shiftAlarm.isEmpty,
      s"stable series must stay quiet: ${r.shiftAlarm}"))
    // flood day: dev = 7*30 - 21 = 189, S+ = 179 > 84 -> alarm now
    val flood = DailyPipeline.run(spark, day("d9", 30), store,
      "2026-07-09", reports)
    assert(flood.shiftAlarm.exists(_.contains("drifted")),
      s"post-warmup level jump must alarm: ${flood.shiftAlarm}")
    // the alarm rode the same delivery path as the other monitors
    assert(flood.volumeAlarm.isDefined, "band alarm fires independently")
  }

  test("xlsx snapshot mode: the reference's exact Today/Yesterday cycle") {
    val root = Files.createTempDirectory("dailyx")
    val day1 = root.resolve("day1"); Files.createDirectories(day1)
    val day2 = root.resolve("day2"); Files.createDirectories(day2)
    val store = root.resolve("store").toString
    val reports = root.resolve("reports").toString

    Files.writeString(day1.resolve("page.html"),
      card(1, "Intern A", "de", "Yes", "12 applicants", "6 weeks") +
        card(2, "Intern B", "eg", "No", "3 applicants", "."))
    val r1 = DailyPipeline.run(spark, day1.toString, store, "2026-08-11",
      reports, xlsxSnapshots = true)
    assert(r1.nToday == 2 && r1.nNew == 2)
    // the snapshot store now holds bona-fide xlsx files
    assert(new java.io.File(s"$store/v=2026-08-11.xlsx").isFile)

    Files.writeString(day2.resolve("page.html"),
      card(1, "Intern A", "de", "Yes", "15 applicants", "6 weeks") +
        card(3, "Intern C", "fr", "Yes", "1 applicant", "8 weeks"))
    val r2 = DailyPipeline.run(spark, day2.toString, store, "2026-08-12",
      reports, xlsxSnapshots = true)
    // the delta anti-join ran against a read-back xlsx snapshot
    assert(r2.nNew == 1)
    val n2 = sheet(r2.newReport.get)
    assert(n2.contains("Intern C") && !n2.contains("Intern A"))
    // rotation keeps two xlsx versions, like Today/Yesterday
    assert(new java.io.File(s"$store/v=2026-08-12.xlsx").isFile &&
      new java.io.File(s"$store/v=2026-08-11.xlsx").isFile)
  }
}
