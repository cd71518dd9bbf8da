package graft.etl

import java.net.ServerSocket
import java.nio.file.{Files, Paths}

import graft.SparkSpec

class AlertSinkSpec extends SparkSpec {

  test("renderCards: one HTML card per row, first column as title, escaped") {
    import spark.implicits._
    val df = Seq(("Intern <A>", "DE & EG", 12L), ("Intern B", "FR", 3L))
      .toDF("title", "country", "applicants")
    val html = AlertSink.renderCards(df)
    assert(html.contains("<h2>Intern &lt;A&gt;</h2>"))
    assert(html.contains("<p>country: DE &amp; EG</p>"))
    assert(html.contains("<p>applicants: 12</p>"))
    assert("""<div class="card">""".r.findAllIn(html).size == 2)
  }

  test("DirectoryAlertSink: one file per alert, never clobbers") {
    val dir = Files.createTempDirectory("alerts").toString
    val sink = new DirectoryAlertSink(dir)
    sink.send("ALERT: 2 new records in 2026-08-11", "<html>one</html>")
    sink.send("ALERT: 2 new records in 2026-08-11", "<html>two</html>")
    val base = "ALERT_2_new_records_in_2026-08-11"
    assert(Files.readString(Paths.get(dir, s"$base.html")) == "<html>one</html>")
    assert(Files.readString(Paths.get(dir, s"$base.1.html")) == "<html>two</html>")
    assert(Files.readString(Paths.get(dir, s"$base.subject"))
      .startsWith("ALERT: 2 new records"))
  }

  test("SmtpAlertSink: full RFC 5321 dialogue against an in-process server") {
    val server = new ServerSocket(0)
    val received = new java.lang.StringBuilder
    val t = new Thread(() => {
      val s = server.accept()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
      val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8"))
      def reply(r: String): Unit = { out.print(r + "\r\n"); out.flush() }
      reply("220 fake ESMTP")
      var inData = false
      var line = in.readLine()
      while (line != null) {
        received.append(line).append('\n')
        if (inData) {
          if (line == ".") { inData = false; reply("250 queued") }
        } else if (line.startsWith("EHLO")) {
          reply("250-fake"); reply("250 OK") // multi-line reply path
        } else if (line.startsWith("DATA")) { inData = true; reply("354 go") }
        else if (line.startsWith("QUIT")) { reply("221 bye"); line = null }
        else reply("250 OK")
        if (line != null) line = in.readLine()
      }
      s.close()
    })
    t.start()
    try {
      new SmtpAlertSink("127.0.0.1", server.getLocalPort,
        "graft@example.org", Seq("ops@example.org"))
        .send("ALERT: 1 new record", "<html>\n.leading dot\n</html>")
      t.join(5000)
      val dialogue = received.toString
      assert(dialogue.contains("MAIL FROM:<graft@example.org>"))
      assert(dialogue.contains("RCPT TO:<ops@example.org>"))
      assert(dialogue.contains("Subject: ALERT: 1 new record"))
      assert(dialogue.contains("Content-Type: text/html; charset=UTF-8"))
      assert(dialogue.contains("..leading dot")) // RFC 5321 dot-stuffing
    } finally server.close()
  }

  test("SmtpAlertSink: a rejected recipient fails loudly") {
    val server = new ServerSocket(0)
    val t = new Thread(() => {
      val s = server.accept()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
      val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8"))
      def reply(r: String): Unit = { out.print(r + "\r\n"); out.flush() }
      reply("220 fake")
      var line = in.readLine()
      while (line != null) {
        if (line.startsWith("RCPT")) { reply("550 no such user"); line = null }
        else { reply("250 OK"); line = in.readLine() }
      }
      s.close()
    })
    t.start()
    try {
      val e = intercept[IllegalArgumentException] {
        new SmtpAlertSink("127.0.0.1", server.getLocalPort,
          "graft@example.org", Seq("nobody@example.org"))
          .send("x", "y")
      }
      assert(e.getMessage.contains("550"))
      t.join(5000)
    } finally server.close()
  }

  test("SmtpAlertSink: CR/LF can't smuggle headers or commands") {
    // injection via addresses is rejected at construction
    intercept[IllegalArgumentException] {
      new SmtpAlertSink("127.0.0.1", 25,
        "a@x\r\nRCPT TO:<evil@x>", Seq("ops@example.org"))
    }
    intercept[IllegalArgumentException] {
      new SmtpAlertSink("127.0.0.1", 25,
        "a@x", Seq("ops@example.org>\r\nDATA"))
    }
    // injection via the subject collapses to one sanitized header
    val server = new ServerSocket(0)
    val received = new java.lang.StringBuilder
    val t = new Thread(() => {
      val s = server.accept()
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
      val out = new java.io.PrintWriter(
        new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8"))
      def reply(r: String): Unit = { out.print(r + "\r\n"); out.flush() }
      reply("220 fake")
      var inData = false
      var line = in.readLine()
      while (line != null) {
        received.append(line).append('\n')
        if (inData) { if (line == ".") { inData = false; reply("250 ok") } }
        else if (line.startsWith("DATA")) { inData = true; reply("354 go") }
        else if (line.startsWith("QUIT")) { reply("221 bye"); line = null }
        else reply("250 OK")
        if (line != null) line = in.readLine()
      }
      s.close()
    })
    t.start()
    try {
      new SmtpAlertSink("127.0.0.1", server.getLocalPort,
        "graft@example.org", Seq("ops@example.org"))
        .send("ALERT\r\nBcc: evil@example.org", "<html></html>")
      t.join(5000)
      val dialogue = received.toString
      assert(dialogue.contains("Subject: ALERT Bcc: evil@example.org"))
      assert(!dialogue.linesIterator.exists(_.startsWith("Bcc:")),
        "CRLF in the subject must not become its own header line")
    } finally server.close()
  }

  test("DailyPipeline delivers the new-records digest through the sink") {
    val root = Files.createTempDirectory("dailya")
    val day1 = root.resolve("day1"); Files.createDirectories(day1)
    Files.writeString(day1.resolve("page.html"),
      """<div class="card"><h2>Intern A</h2>
        |<p>id: 1</p><p>country: de</p><p>premium: Yes</p>
        |<p>applicants: 12 applicants</p><p>duration: 6 weeks</p>
        |<p>organization: org1</p></div>""".stripMargin)
    val alerts = root.resolve("alerts").toString
    val r = DailyPipeline.run(spark, day1.toString,
      root.resolve("store").toString, "2026-08-13",
      root.resolve("reports").toString,
      alertSink = new DirectoryAlertSink(alerts))
    assert(r.nNew == 1)
    val files = new java.io.File(alerts).list().toSeq
    assert(files.exists(_.endsWith(".html")))
    val html = Files.readString(
      Paths.get(alerts, files.filter(_.endsWith(".html")).head))
    assert(html.contains("card") && html.contains("country: DE"))
  }
}
