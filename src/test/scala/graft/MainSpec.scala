package graft

import java.nio.file.Files

import graft.etl.{AlertSink, DirectoryAlertSink, SmtpAlertSink}

/** A30 `graft.Main` — the scheduler-facing entrypoint: arg parsing and
  * one end-to-end run against a provided session (docs/SCHEDULING.md
  * carries the cron/Airflow recipes that invoke it).
  */
class MainSpec extends SparkSpec {

  test("sink flags parse to the right implementations") {
    assert(Main.parseSink(Array("a", "b")) == AlertSink.Noop)
    assert(Main.parseSink(Array("--alert-dir", "/tmp/x"))
      .isInstanceOf[DirectoryAlertSink])
    assert(Main.parseSink(
      Array("--smtp", "relay:25:graft@x.org:a@x.org,b@x.org"))
      .isInstanceOf[SmtpAlertSink])
    intercept[IllegalArgumentException] {
      Main.parseSink(Array("--smtp", "relay:25"))
    }
  }

  test("run: end-to-end daily job with flags, JSON summary out") {
    val root = Files.createTempDirectory("main")
    val day = root.resolve("day"); Files.createDirectories(day)
    Files.writeString(day.resolve("page.html"),
      """<div class="card"><h2>Intern A</h2>
        |<p>id: 1</p><p>country: de</p><p>premium: Yes</p>
        |<p>applicants: 2 applicants</p><p>duration: 6 weeks</p>
        |<p>organization: org1</p></div>""".stripMargin)
    val alerts = root.resolve("alerts")
    val out = Main.run(spark, Array(
      day.toString, root.resolve("store").toString, "2026-08-13",
      root.resolve("reports").toString,
      "--xlsx-snapshots", "--alert-dir", alerts.toString))
    assert(out.contains(""""version":"2026-08-13""""))
    assert(out.contains(""""n_today":1""") && out.contains(""""n_new":1"""))
    assert(out.contains(""""alerted":true"""))
    // flags took effect: xlsx snapshot medium + delivered digest
    assert(new java.io.File(
      s"${root.resolve("store")}/v=2026-08-13.xlsx").isFile)
    assert(new java.io.File(alerts.toString).list().exists(_.endsWith(".html")))
  }

  test("summary JSON escapes quotes, backslashes and control chars") {
    assert(Main.jstr("plain") == "\"plain\"")
    assert(Main.jstr("ver\"si\\on") == "\"ver\\\"si\\\\on\"")
    assert(Main.jstr("a\nb\rc\tde") == "\"a\\nb\\rc\\td\\u0001e\"")
    // a hostile version string still yields machine-parseable JSON:
    // every quote inside the literal is escaped
    val j = Main.jstr("""v"1\2""" + "\n")
    val inner = j.substring(1, j.length - 1)
    var i = 0; var bare = 0
    while (i < inner.length) {
      if (inner(i) == '\\') i += 2
      else { if (inner(i) == '"') bare += 1; i += 1 }
    }
    assert(bare == 0, s"unescaped quote survives in $j")
  }

  test("run: wrong positional arity fails with usage") {
    val e = intercept[IllegalArgumentException] {
      Main.run(spark, Array("only", "three", "args"))
    }
    assert(e.getMessage.contains("usage:"))
  }
}
