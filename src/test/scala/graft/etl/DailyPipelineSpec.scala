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
