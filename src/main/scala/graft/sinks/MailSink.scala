package graft.sinks

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

/** K10 — alert/notification sink (send_mail, common.py:451-468, and
  * the no-server fallback send_mail_file, common.py:440-448). The
  * reference emails a failure digest at the end of a run; this is a
  * dependency-free SMTP client speaking the public RFC 5321 dialogue
  * (EHLO → optional AUTH LOGIN → MAIL FROM/RCPT TO/DATA → QUIT) with
  * RFC 5322 headers and dot-stuffing, tested against a local stub
  * server (SourcesSinksSpec pattern). STARTTLS upgrades are the
  * transport operator's concern (wrap the socket with an
  * SSLSocketFactory before handing it over) — the dialogue is
  * identical either side of the upgrade.
  *
  * Driver-side by design: one alert mail per run (the reference sends
  * exactly one digest), never a per-row executor action.
  */
object MailSink {

  /** The reference's no-SMTP fallback: append the message to a
    * timestamped file next to `filenameRoot` (common.py:440-448). */
  def sendMailFile(message: String, filenameRoot: String,
      ts: Long = System.currentTimeMillis): java.nio.file.Path = {
    val p = java.nio.file.Paths.get(s"$filenameRoot$ts.txt")
    java.nio.file.Files.write(p, (message + "\n").getBytes(UTF_8))
    p
  }

  /** RFC 5322 message text: headers + blank line + body. */
  private[graft] def mimeText(from: String, to: String, subject: String,
      body: String): String =
    s"Subject: $subject\r\nFrom: $from\r\nTo: $to\r\n" +
      "MIME-Version: 1.0\r\nContent-Type: text/plain; charset=utf-8\r\n" +
      "\r\n" + body

  /** Dot-stuff + CRLF-normalize a body for the DATA phase: a line
    * beginning with '.' gets a second '.' so it cannot terminate the
    * message early (RFC 5321 §4.5.2). */
  private[graft] def dotStuff(text: String): String =
    text.split("\r?\n", -1)
      .map(l => if (l.startsWith(".")) "." + l else l)
      .mkString("\r\n")

  /** Send one message over an open socket (plain or TLS-wrapped).
    * Fails loudly on any non-2xx/3xx reply — a swallowed alert is an
    * unsent alert. */
  def sendOver(socket: Socket, from: String, to: String,
      subject: String, body: String,
      auth: Option[(String, String)] = None): Unit =
    try {
      val in = new BufferedReader(
        new InputStreamReader(socket.getInputStream, UTF_8))
      val out = new OutputStreamWriter(socket.getOutputStream, UTF_8)
      /** Read one (possibly multiline "250-…") reply; return the
        * code. A closed connection or garbage where the code belongs
        * is an IOException, not an NPE/NumberFormatException. */
      def reply(): Int = {
        var line = in.readLine()
        if (line == null) throw new java.io.IOException(
          "SMTP connection closed mid-dialogue")
        val code = line.take(3).toIntOption.getOrElse(
          throw new java.io.IOException(s"malformed SMTP reply: $line"))
        while (line != null && line.length > 3 && line.charAt(3) == '-')
          line = in.readLine()
        code
      }
      def cmd(s: String, expect: Int*): Unit = {
        out.write(s + "\r\n"); out.flush()
        val c = reply()
        if (!expect.contains(c))
          throw new java.io.IOException(s"SMTP '$s' got $c")
      }
      if (reply() != 220)
        throw new java.io.IOException("no SMTP greeting")
      cmd("EHLO graft", 250)
      auth.foreach { case (user, pwd) =>
        val b64 = java.util.Base64.getEncoder
        cmd("AUTH LOGIN", 334)
        cmd(new String(b64.encode(user.getBytes(UTF_8)), UTF_8), 334)
        cmd(new String(b64.encode(pwd.getBytes(UTF_8)), UTF_8), 235)
      }
      cmd(s"MAIL FROM:<$from>", 250)
      cmd(s"RCPT TO:<$to>", 250)
      cmd("DATA", 354)
      cmd(dotStuff(mimeText(from, to, subject, body)) + "\r\n.", 250)
      cmd("QUIT", 221)
    } finally socket.close() // a failed alert must not leak the socket

  /** send_mail (common.py:451-468): connect and send one digest. The
    * alert path must never hang the run it reports on — connect and
    * read both time out. */
  def sendMail(host: String, port: Int, from: String, to: String,
      subject: String, body: String,
      auth: Option[(String, String)] = None,
      connectTimeoutMs: Int = 15000, readTimeoutMs: Int = 60000)
      : Unit = {
    val socket = new Socket()
    socket.connect(new java.net.InetSocketAddress(host, port),
      connectTimeoutMs)
    socket.setSoTimeout(readTimeoutMs)
    sendOver(socket, from, to, subject, body, auth)
  }
}
