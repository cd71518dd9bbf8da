package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import graft.sources.FetchSource.PageDriver

/** The switch-proof capstone: ONE DailyPipeline run with every
  * reference-parity boundary engaged at once — live fetch (scripted
  * PageDriver), xlsx snapshot medium (the reference's exact
  * Today/Yesterday.xlsx cycle), and TLS-delivered alerts (the
  * reference's SMTP_SSL transport) — proving the composed arms work
  * TOGETHER, not just in their own specs.
  */
class DailyPipelineFullStackSpec extends SparkSpec {

  private def card(id: Int): String =
    s"""<div class="card"><h2>Intern $id</h2>
       |<p>id: $id</p><p>country: de</p><p>premium: Yes</p>
       |<p>applicants: $id applicants</p><p>duration: 6 weeks</p>
       |<p>organization: org$id</p></div>""".stripMargin

  private class FakeDriver(pages: Seq[String]) extends PageDriver {
    var page = 0
    override def acceptConsent(): Boolean = true
    override def loadMore(): Boolean = {
      if (page < pages.size - 1) { page += 1; true } else false
    }
    override def pageSource(): String = pages(page)
  }

  private lazy val sslCtx: javax.net.ssl.SSLContext = {
    val ks = Files.createTempDirectory("fstls").resolve("ks.p12")
    val keytool = new ProcessBuilder(
      System.getProperty("java.home") + "/bin/keytool",
      "-genkeypair", "-alias", "t", "-keyalg", "RSA", "-keysize", "2048",
      "-storetype", "PKCS12", "-keystore", ks.toString,
      "-storepass", "changeit", "-dname", "CN=127.0.0.1",
      "-ext", "san=ip:127.0.0.1", "-validity", "2").start()
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
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, tmf.getTrustManagers, null)
    ctx
  }

  test("fetch -> xlsx snapshots -> diff -> TLS-delivered alert, end to end") {
    val root = Files.createTempDirectory("fullstack")
    val store = root.resolve("store").toString
    val reports = root.resolve("reports").toString

    // in-process SMTPS server collecting everything that arrives
    val server = sslCtx.getServerSocketFactory.createServerSocket(0)
    val received = new java.lang.StringBuilder
    val acceptor = new Thread(() => {
      try {
        while (!server.isClosed) {
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
            received.synchronized { received.append(line).append('\n') }
            if (inData) { if (line == ".") { inData = false; reply("250 ok") } }
            else if (line.startsWith("EHLO")) { reply("250-f"); reply("250 OK") }
            else if (line.startsWith("DATA")) { inData = true; reply("354 go") }
            else if (line.startsWith("QUIT")) { reply("221 bye"); line = null }
            else reply("250 OK")
            if (line != null) line = in.readLine()
          }
          s.close()
        }
      } catch { case _: Throwable => () } // server.close() unblocks accept
    })
    acceptor.start()
    val sink = new SmtpAlertSink("127.0.0.1", server.getLocalPort,
      "graft@example.org", Seq("ops@example.org"),
      tls = SmtpAlertSink.Tls.Smtps,
      sslFactory = () => sslCtx.getSocketFactory)

    try {
      // day 1: two cards behind one load-more click
      val r1 = DailyPipeline.run(spark, cardsPath = "", storeRoot = store,
        version = "2026-08-13", reportDir = reports,
        xlsxSnapshots = true, alertSink = sink,
        fetcher = Some(new FakeDriver(Seq(card(1), card(1) + card(2)))))
      assert(r1.nToday == 2 && r1.nNew == 2)

      // day 2: one genuinely new card
      val r2 = DailyPipeline.run(spark, cardsPath = "", storeRoot = store,
        version = "2026-08-14", reportDir = reports,
        xlsxSnapshots = true, alertSink = sink,
        fetcher = Some(new FakeDriver(
          Seq(card(1), card(1) + card(2), card(1) + card(2) + card(3)))))
      assert(r2.nToday == 3 && r2.nNew == 1)
      assert(r2.alert.contains("ALERT: 1 new records in 2026-08-14"))

      // the xlsx snapshot medium actually rotated
      val snaps = new java.io.File(store).listFiles().map(_.getName)
      assert(snaps.exists(_.endsWith(".xlsx")),
        s"expected xlsx snapshots in store, got ${snaps.toSeq}")
      // the fetched DOMs are materialized per day
      assert(new java.io.File(s"$store/_fetched/2026-08-14.html").isFile)
      // the day-2 alert crossed the TLS socket with the new card only
      val dialogue = received.synchronized(received.toString)
      val day2 = dialogue.indexOf("Subject: ALERT: 1 new records in 2026-08-14")
      assert(day2 >= 0, "day-2 alert must cross the TLS socket")
      val day2Body = dialogue.substring(day2)
      assert(day2Body.contains("Intern 3") && !day2Body.contains("Intern 1"),
        "the day-2 digest must carry exactly the new record")
    } finally {
      server.close()
      acceptor.join(5000)
    }
  }
}
