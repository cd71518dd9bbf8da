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

  /** Self-signed TLS context for the in-process servers: keytool (ships
    * with the JDK) generates a PKCS12 keystore once per suite; the same
    * store serves as the server's key material and the client's pinned
    * trust. SAN ip:127.0.0.1 satisfies the sink's endpoint
    * identification.
    */
  private lazy val sslCtx: javax.net.ssl.SSLContext = {
    val ks = Files.createTempDirectory("tls").resolve("ks.p12")
    val keytool = new ProcessBuilder(
      System.getProperty("java.home") + "/bin/keytool",
      "-genkeypair", "-alias", "t", "-keyalg", "RSA", "-keysize", "2048",
      "-storetype", "PKCS12", "-keystore", ks.toString,
      "-storepass", "changeit", "-dname", "CN=127.0.0.1",
      "-ext", "san=ip:127.0.0.1", "-validity", "2").start()
    require(keytool.waitFor() == 0, "keytool failed")
    val store = java.security.KeyStore.getInstance("PKCS12")
    val is = Files.newInputStream(ks)
    try store.load(is, "changeit".toCharArray) finally is.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, "changeit".toCharArray)
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(store)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)
    ctx
  }

  /** The fake server's SMTP dialogue over whatever socket it's handed
    * (plain or TLS); `onStartTls` upgrades and recurses.
    */
  private def smtpDialogue(s: java.net.Socket,
      received: java.lang.StringBuilder,
      startTlsUpgrade: Option[java.net.Socket => java.net.Socket]): Unit = {
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
        if (startTlsUpgrade.isDefined) { reply("250-fake"); reply("250 STARTTLS") }
        else { reply("250-fake"); reply("250 OK") }
      } else if (line.startsWith("STARTTLS") && startTlsUpgrade.isDefined) {
        reply("220 go ahead")
        val tlsSock = startTlsUpgrade.get(s)
        smtpDialogueAfterTls(tlsSock, received)
        line = null
      } else if (line.startsWith("DATA")) { inData = true; reply("354 go") }
      else if (line.startsWith("QUIT")) { reply("221 bye"); line = null }
      else reply("250 OK")
      if (line != null) line = in.readLine()
    }
  }

  /** Post-upgrade half of the STARTTLS server: fresh streams on the
    * TLS socket, no greeting (the session resumes at EHLO).
    */
  private def smtpDialogueAfterTls(s: java.net.Socket,
      received: java.lang.StringBuilder): Unit = {
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(s.getInputStream, "UTF-8"))
    val out = new java.io.PrintWriter(
      new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8"))
    def reply(r: String): Unit = { out.print(r + "\r\n"); out.flush() }
    var inData = false
    var line = in.readLine()
    while (line != null) {
      received.append("TLS|").append(line).append('\n')
      if (inData) { if (line == ".") { inData = false; reply("250 queued") } }
      else if (line.startsWith("EHLO")) { reply("250-fake"); reply("250 OK") }
      else if (line.startsWith("DATA")) { inData = true; reply("354 go") }
      else if (line.startsWith("QUIT")) { reply("221 bye"); line = null }
      else reply("250 OK")
      if (line != null) line = in.readLine()
    }
  }

  test("SmtpAlertSink: implicit-TLS (SMTPS) delivery, the reference's SMTP_SSL") {
    val server = sslCtx.getServerSocketFactory.createServerSocket(0)
    val received = new java.lang.StringBuilder
    val t = new Thread(() => {
      val s = server.accept()
      try smtpDialogue(s, received, None) finally s.close()
    })
    t.start()
    try {
      new SmtpAlertSink("127.0.0.1", server.getLocalPort,
        "graft@example.org", Seq("ops@example.org"),
        tls = SmtpAlertSink.Tls.Smtps,
        sslFactory = () => sslCtx.getSocketFactory)
        .send("ALERT: smtps", "<html>tls</html>")
      t.join(10000)
      val dialogue = received.toString
      assert(dialogue.contains("MAIL FROM:<graft@example.org>"))
      assert(dialogue.contains("Subject: ALERT: smtps"))
    } finally server.close()
  }

  test("SmtpAlertSink: STARTTLS upgrade — mail commands only after the handshake") {
    val server = new ServerSocket(0)
    val received = new java.lang.StringBuilder
    val upgrade: java.net.Socket => java.net.Socket = { plain =>
      val ssl = sslCtx.getSocketFactory
        .createSocket(plain, null, plain.getPort, false)
        .asInstanceOf[javax.net.ssl.SSLSocket]
      ssl.setUseClientMode(false)
      ssl.startHandshake()
      ssl
    }
    val t = new Thread(() => {
      val s = server.accept()
      try smtpDialogue(s, received, Some(upgrade)) finally s.close()
    })
    t.start()
    try {
      new SmtpAlertSink("127.0.0.1", server.getLocalPort,
        "graft@example.org", Seq("ops@example.org"),
        tls = SmtpAlertSink.Tls.StartTls,
        sslFactory = () => sslCtx.getSocketFactory)
        .send("ALERT: starttls", "<html>tls</html>")
      t.join(10000)
      val dialogue = received.toString
      // plaintext phase saw ONLY EHLO + STARTTLS; everything
      // mail-bearing crossed the encrypted channel
      val plaintext = dialogue.linesIterator
        .filterNot(_.startsWith("TLS|")).toSeq
      assert(plaintext.forall(l =>
        l.startsWith("EHLO") || l.startsWith("STARTTLS")), plaintext)
      assert(dialogue.contains("TLS|MAIL FROM:<graft@example.org>"))
      assert(dialogue.contains("TLS|Subject: ALERT: starttls"))
    } finally server.close()
  }

  test("SmtpAlertSink: TLS endpoint identification rejects a wrong-host cert") {
    // a keystore whose SAN is a DIFFERENT ip: handshake must fail
    val ks = Files.createTempDirectory("tlsbad").resolve("bad.p12")
    val keytool = new ProcessBuilder(
      System.getProperty("java.home") + "/bin/keytool",
      "-genkeypair", "-alias", "t", "-keyalg", "RSA", "-keysize", "2048",
      "-storetype", "PKCS12", "-keystore", ks.toString,
      "-storepass", "changeit", "-dname", "CN=10.9.9.9",
      "-ext", "san=ip:10.9.9.9", "-validity", "2").start()
    require(keytool.waitFor() == 0)
    val store = java.security.KeyStore.getInstance("PKCS12")
    val is = Files.newInputStream(ks)
    try store.load(is, "changeit".toCharArray) finally is.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, "changeit".toCharArray)
    val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
      javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(store)
    val badCtx = javax.net.ssl.SSLContext.getInstance("TLS")
    badCtx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)

    val server = badCtx.getServerSocketFactory.createServerSocket(0)
    val t = new Thread(() => {
      try {
        val s = server.accept()
        try smtpDialogue(s, new java.lang.StringBuilder, None)
        finally s.close()
      } catch { case _: Throwable => () } // client aborts the handshake
    })
    t.start()
    try {
      intercept[Exception] {
        new SmtpAlertSink("127.0.0.1", server.getLocalPort,
          "graft@example.org", Seq("ops@example.org"),
          tls = SmtpAlertSink.Tls.Smtps,
          sslFactory = () => badCtx.getSocketFactory)
          .send("x", "y")
      }
      t.join(10000)
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
