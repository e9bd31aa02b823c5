package graft.alerts

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.Base64

/** Minimal SMTP (RFC 5321) client — the delivery half of the reference's
  * email worker (`/root/reference/src/io/email/EmailWorker.java:560-660`
  * delegates to javax.mail; zero-dependency here, like the hand-rolled
  * MQTT codec in `graft.sources.MqttLite`). Speaks EHLO, optional AUTH
  * PLAIN, MAIL FROM / RCPT TO / DATA with dot-stuffing, QUIT. TLS is
  * deployment config (wrap the socket with SSLSocketFactory when `ssl`);
  * plaintext is what the embedded test server speaks.
  */
object SmtpClient {

  final class SmtpException(msg: String) extends RuntimeException(msg)

  /** Deliver one pre-built RFC 822 message. Throws [[SmtpException]] on
    * any non-success reply — the caller's retry queue handles it.
    */
  def send(cfg: MailboxCfg, from: String, recipients: Seq[String], message: String): Unit = {
    val socket =
      if (cfg.ssl)
        javax.net.ssl.SSLSocketFactory.getDefault.createSocket(cfg.server, cfg.port)
      else new Socket(cfg.server, cfg.port)
    socket.setSoTimeout(60000) // reference fixes 60 s on all SMTP ops
    val in = new BufferedReader(
      new InputStreamReader(socket.getInputStream, StandardCharsets.ISO_8859_1))
    val rawOut = socket.getOutputStream
    val out = new OutputStreamWriter(rawOut, StandardCharsets.ISO_8859_1)

    def reply(): String = {
      // multi-line replies: "250-..." continues, "250 ..." ends
      var line = in.readLine()
      if (line == null) throw new SmtpException("connection closed")
      val first = line
      while (line != null && line.length >= 4 && line.charAt(3) == '-')
        line = in.readLine()
      first
    }
    def expect(code: Char, sent: String): Unit = {
      val r = reply()
      if (r.isEmpty || r.charAt(0) != code)
        throw new SmtpException(s"unexpected reply '$r' to '$sent'")
    }
    def cmd(c: String, okCode: Char): Unit = {
      out.write(c); out.write("\r\n"); out.flush()
      expect(okCode, c)
    }

    try {
      expect('2', "<greeting>")
      cmd("EHLO graft", '2')
      if (cfg.user.nonEmpty || cfg.pass.nonEmpty) {
        val token = Base64.getEncoder.encodeToString(
          ("\u0000" + cfg.user + "\u0000" + cfg.pass).getBytes(StandardCharsets.UTF_8))
        cmd(s"AUTH PLAIN $token", '2')
      }
      cmd(s"MAIL FROM:<${bareAddress(from)}>", '2')
      recipients.foreach(r => cmd(s"RCPT TO:<${bareAddress(r)}>", '2'))
      cmd("DATA", '3')
      // dot-stuffing: a leading '.' on a line doubles (RFC 5321 §4.5.2)
      val stuffed = message.linesWithSeparators
        .map(l => if (l.startsWith(".")) "." + l else l).mkString
      // The message declares charset=utf-8, so its bytes must go out as
      // UTF-8 — through the raw stream, not the ISO-8859-1 command writer
      // (which would fold chars >0xFF to '?').
      rawOut.write(stuffed.getBytes(StandardCharsets.UTF_8))
      if (!stuffed.endsWith("\r\n") && !stuffed.endsWith("\n"))
        rawOut.write("\r\n".getBytes(StandardCharsets.UTF_8))
      rawOut.flush()
      cmd(".", '2')
      cmd("QUIT", '2')
    } finally socket.close()
  }

  /** Strip display-name / `|`-suffix forms down to the bare address
    * (reference splits recipients on `|` before InternetAddress).
    */
  def bareAddress(s: String): String = {
    val noPipe = s.split("\\|")(0).trim
    val lt = noPipe.indexOf('<')
    if (lt >= 0 && noPipe.endsWith(">")) noPipe.substring(lt + 1, noPipe.length - 1)
    else noPipe
  }

  // ---- RFC 822 / MIME message building ----

  /** Build the message for an [[Email]]: text/html body, optional
    * base64 attachment as multipart/mixed — the shape the reference
    * builds via MimeMessage (`EmailWorker.java:585-737`). The attachment
    * bytes are passed in (the worker applies the zip/size rules first);
    * `attachName` empty means no attachment part.
    */
  def buildMessage(
      from: String,
      to: Seq[String],
      subject: String,
      htmlContent: String,
      attachName: String = "",
      attachBytes: Array[Byte] = Array.emptyByteArray): String = {
    val sb = new StringBuilder
    def header(k: String, v: String): Unit = sb.append(k).append(": ").append(v).append("\r\n")
    // Never let a header value smuggle CRLF (header injection / early DATA
    // termination); addresses get stripped only, free-text headers get
    // RFC 2047 B-encoding when non-ASCII.
    header("From", stripCrlf(from))
    header("To", to.map(stripCrlf).mkString(", "))
    header("Subject", encodeHeader(subject))
    header("MIME-Version", "1.0")
    if (attachName.isEmpty) {
      header("Content-Type", "text/html; charset=utf-8")
      sb.append("\r\n").append(htmlContent).append("\r\n")
    } else {
      val boundary = "----graft-" + Integer.toHexString(
        (from + subject + attachName).hashCode)
      header("Content-Type", s"""multipart/mixed; boundary="$boundary"""")
      sb.append("\r\n")
      sb.append("--").append(boundary).append("\r\n")
      sb.append("Content-Type: text/html; charset=utf-8\r\n\r\n")
      sb.append(htmlContent).append("\r\n")
      sb.append("--").append(boundary).append("\r\n")
      sb.append("Content-Type: application/octet-stream\r\n")
      sb.append(s"""Content-Disposition: attachment; filename="$attachName"""").append("\r\n")
      sb.append("Content-Transfer-Encoding: base64\r\n\r\n")
      val b64 = Base64.getEncoder.encodeToString(attachBytes)
      b64.grouped(76).foreach(l => sb.append(l).append("\r\n"))
      sb.append("--").append(boundary).append("--\r\n")
    }
    sb.toString
  }

  private def stripCrlf(v: String): String = v.replaceAll("[\r\n]+", " ")

  /** RFC 2047 B-encoded word for non-ASCII free-text header values;
    * CRLF-stripped plain text otherwise.
    */
  def encodeHeader(v: String): String = {
    val clean = stripCrlf(v)
    if (clean.forall(c => c >= 0x20 && c < 0x7f)) clean
    else "=?UTF-8?B?" +
      Base64.getEncoder.encodeToString(clean.getBytes(StandardCharsets.UTF_8)) + "?="
  }

  /** Zip a file next to itself as `<file>.zip` (reference
    * `FileTools.zipFile`, used by the attachment size rule).
    */
  def zipFile(p: Path): Path = graft.FileZip.zipFile(p)
}
