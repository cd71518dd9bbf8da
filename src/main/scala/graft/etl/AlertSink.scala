package graft.etl

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}

/** A29 `AlertSink` — the delivery boundary for conditional alerts,
  * closing the reference's last pipeline step (it SENDS the new-records
  * email over SMTP, aiesec.py:236-249; graft previously built the
  * payload but stopped there).
  *
  * The contract is deliberately tiny — subject + HTML body — because
  * everything upstream of it is distributed and everything downstream
  * of it is not: an alert is O(delta) by construction (the reference
  * mails a handful of cards), so the sink runs driver-side on an
  * already-aggregated payload. Implementations:
  *
  *  - [[AlertSink.Noop]] — delivery unconfigured (the default).
  *  - [[DirectoryAlertSink]] — one .html file per alert in a local
  *    directory; the audit trail / local-dev sink.
  *  - [[SmtpAlertSink]] — minimal RFC 5321 client (EHLO / MAIL FROM /
  *    RCPT TO / DATA / QUIT, UTF-8 HTML MIME), matching the
  *    reference's `smtplib` usage. Host/port/addresses come from
  *    explicit config; nothing sends unless the caller provides them.
  */
trait AlertSink {
  def send(subject: String, htmlBody: String): Unit
}

object AlertSink {

  /** Delivery unconfigured: alerts are dropped (the payload is still
    * returned/persisted by the pipeline — only the push is skipped).
    */
  object Noop extends AlertSink {
    override def send(subject: String, htmlBody: String): Unit = ()
  }

  val MaxCards = 1000 // an alert is a digest, not a data export

  /** Render a (small, already-aggregated) frame as the reference's
    * HTML-card email body (≈ aiesec.py:216-233): one card per row,
    * first column as the card title, remaining columns as labeled
    * lines. Caps at [[MaxCards]] rows — alerts summarize deltas, they
    * don't ship tables.
    */
  def renderCards(df: DataFrame): String = {
    val cols = df.columns.toSeq
    val rows = df.limit(MaxCards + 1).collect().toSeq
    require(rows.size <= MaxCards,
      s"AlertSink.renderCards is a digest renderer: aggregate first (>$MaxCards rows)")
    def esc(v: Any): String = Option(v).map(_.toString).getOrElse("")
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val cards = rows.map { (r: Row) =>
      val fields = cols.tail.zipWithIndex.map { case (c, i) =>
        s"<p>$c: ${esc(r.get(i + 1))}</p>"
      }.mkString
      s"""<div class="card"><h2>${esc(r.get(0))}</h2>$fields</div>"""
    }.mkString("\n")
    s"<html><body>\n$cards\n</body></html>"
  }
}

/** File-per-alert sink: `dir/<version>.html` (+ a `.subject` sidecar).
  * The local-dev / audit-trail delivery path; also what you point a
  * separate mailer daemon at when the cluster can't reach SMTP.
  */
class DirectoryAlertSink(dir: String) extends AlertSink {

  private def slug(s: String): String =
    s.replaceAll("[^A-Za-z0-9._-]+", "_").take(120)

  override def send(subject: String, htmlBody: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    val base = slug(subject)
    // never clobber an earlier alert: suffix a sequence number
    val name = Iterator.from(0)
      .map(i => if (i == 0) base else s"$base.$i")
      .find(n => !Files.exists(Paths.get(dir, s"$n.html"))).get
    Files.writeString(Paths.get(dir, s"$name.html"), htmlBody)
    Files.writeString(Paths.get(dir, s"$name.subject"), subject)
  }
}

object SmtpAlertSink {
  /** Transport security mode. The reference uses implicit TLS
    * (`smtplib.SMTP_SSL`, port 465 — aiesec.py:245) ≡ [[Tls.Smtps]].
    */
  sealed trait Tls
  object Tls {
    /** Plain socket — the in-network relay-host pattern (the default:
      * nothing credentials-bearing should cross this link).
      */
    case object Plain extends Tls
    /** Implicit TLS from the first byte (SMTPS, conventionally :465) —
      * the reference's `smtplib.SMTP_SSL` transport.
      */
    case object Smtps extends Tls
    /** RFC 3207 upgrade (conventionally :587): plain EHLO, `STARTTLS`,
      * handshake, then the dialogue restarts with a second EHLO.
      */
    case object StartTls extends Tls
  }
}

/** Minimal SMTP delivery (≈ the reference's smtplib block,
  * aiesec.py:236-249) — RFC 5321 dialogue with a UTF-8 HTML MIME
  * payload, over a plain socket, implicit TLS (SMTPS — the
  * reference's `SMTP_SSL`), or a STARTTLS upgrade. TLS sockets
  * enable endpoint identification (hostname/SAN check), so a
  * misdirected connection fails the handshake instead of delivering
  * the alert elsewhere. No AUTH: credentials-bearing setups should
  * front a local relay. Every response is checked and a non-2xx/3xx
  * code fails loudly — a dropped alert must never look delivered.
  *
  * Injection hygiene: addresses are validated at construction (no
  * CR/LF/angle brackets — they would terminate or fake an SMTP
  * command), and the subject header strips CR/LF so alert content can
  * never smuggle extra headers (Bcc:) or commands into the dialogue.
  *
  * @param sslFactory socket factory for the TLS modes — the JVM
  *        default trust store unless the caller brings a pinned one
  *        (specs bring an in-process CA).
  */
class SmtpAlertSink(host: String, port: Int, from: String,
    to: Seq[String],
    tls: SmtpAlertSink.Tls = SmtpAlertSink.Tls.Plain,
    sslFactory: () => javax.net.ssl.SSLSocketFactory =
      () => javax.net.ssl.SSLSocketFactory.getDefault
        .asInstanceOf[javax.net.ssl.SSLSocketFactory]) extends AlertSink {
  require(to.nonEmpty, "SmtpAlertSink: at least one recipient")
  (from +: to).foreach { a =>
    require(!a.exists(c => c == '\r' || c == '\n' || c == '<' || c == '>'),
      s"SmtpAlertSink: illegal address '${a.replaceAll("[\\r\\n]", " ")}'")
  }

  import SmtpAlertSink.Tls

  private def identified(s: javax.net.ssl.SSLSocket): javax.net.ssl.SSLSocket = {
    val p = s.getSSLParameters
    p.setEndpointIdentificationAlgorithm("HTTPS")
    s.setSSLParameters(p)
    s
  }

  override def send(subject: String, htmlBody: String): Unit = {
    var socket: Socket = tls match {
      case Tls.Smtps =>
        identified(sslFactory().createSocket(host, port)
          .asInstanceOf[javax.net.ssl.SSLSocket])
      case _ => new Socket(host, port)
    }
    try {
      var in = new BufferedReader(
        new InputStreamReader(socket.getInputStream, "UTF-8"))
      var out = new PrintWriter(
        new java.io.OutputStreamWriter(socket.getOutputStream, "UTF-8"))
      def expect(codes: Set[Int]): Unit = {
        // multi-line replies: "250-..." continues, "250 ..." ends
        var line = in.readLine()
        while (line != null && line.length >= 4 && line.charAt(3) == '-')
          line = in.readLine()
        require(line != null && line.length >= 3 &&
          codes.contains(line.take(3).toInt), s"SMTP: unexpected reply '$line'")
      }
      def cmd(s: String, codes: Set[Int]): Unit = {
        out.print(s + "\r\n"); out.flush(); expect(codes)
      }
      expect(Set(220))
      cmd(s"EHLO graft", Set(250))
      if (tls == Tls.StartTls) {
        cmd("STARTTLS", Set(220))
        val ssl = identified(sslFactory()
          .createSocket(socket, host, port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket])
        ssl.startHandshake()
        socket = ssl
        in = new BufferedReader(
          new InputStreamReader(socket.getInputStream, "UTF-8"))
        out = new PrintWriter(
          new java.io.OutputStreamWriter(socket.getOutputStream, "UTF-8"))
        // RFC 3207 §4.2: the session state resets — EHLO again
        cmd(s"EHLO graft", Set(250))
      }
      cmd(s"MAIL FROM:<$from>", Set(250))
      to.foreach(r => cmd(s"RCPT TO:<$r>", Set(250, 251)))
      cmd("DATA", Set(354))
      val subj = subject.replaceAll("[\\r\\n]+", " ")
      val headers = Seq(
        s"From: $from",
        s"To: ${to.mkString(", ")}",
        s"Subject: $subj",
        "MIME-Version: 1.0",
        "Content-Type: text/html; charset=UTF-8")
      // dot-stuffing per RFC 5321 §4.5.2
      val body = htmlBody.linesIterator
        .map(l => if (l.startsWith(".")) "." + l else l).mkString("\r\n")
      cmd(headers.mkString("\r\n") + "\r\n\r\n" + body + "\r\n.", Set(250))
      cmd("QUIT", Set(221))
    } finally socket.close()
  }
}
