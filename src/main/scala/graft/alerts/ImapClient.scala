package graft.alerts

import java.io.{BufferedInputStream, OutputStreamWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ListBuffer

/** Minimal IMAP4rev1 client covering exactly what the reference inbox
  * check uses (`/root/reference/src/io/email/EmailWorker.java:804-960`):
  * LOGIN, SELECT INBOX, SEARCH UNSEEN, FETCH BODY[], STORE \Seen/\Deleted,
  * EXPUNGE, LOGOUT. Fetch literals (`{n}` byte counts) are parsed
  * byte-exact so message bodies round-trip unchanged.
  */
object ImapClient {

  final class ImapException(msg: String) extends RuntimeException(msg)

  /** One fetched message plus the flag mutations the caller decided on. */
  final case class FetchedMessage(seq: Int, raw: String) {
    lazy val (headers, body) = Rfc822.split(raw)
    def from: String = Rfc822.address(headers.getOrElse("from", ""))
    def to: String = Rfc822.address(headers.getOrElse("to", ""))
    def subject: String = headers.getOrElse("subject", "")
    def contentType: String = headers.getOrElse("content-type", "text/plain")
    /** Plain-text content: direct body, or the first text part of a
      * multipart message (reference `getTextFromMessage`).
      */
    def text: String = Rfc822.text(contentType, body)
  }

  /** Connect, fetch all UNSEEN messages, hand each to `handle`, apply the
    * returned flag decision, expunge, logout. `handle` returns:
    * Delete (flag \Deleted), Keep (leave \Seen), Unsee (revert to unseen —
    * the multi-instance " for " path).
    */
  sealed trait Disposition
  case object Delete extends Disposition
  case object Keep extends Disposition
  case object Unsee extends Disposition

  def checkUnseen(cfg: MailboxCfg)(handle: FetchedMessage => Disposition): Int = {
    val socket =
      if (cfg.ssl)
        javax.net.ssl.SSLSocketFactory.getDefault.createSocket(cfg.server, cfg.port)
      else new Socket(cfg.server, cfg.port)
    socket.setSoTimeout(10000) // reference fixes 10 s on all IMAP ops
    val in = new BufferedInputStream(socket.getInputStream)
    val out = new OutputStreamWriter(socket.getOutputStream, StandardCharsets.ISO_8859_1)
    var tagN = 0

    def readLine(): String = {
      val sb = new StringBuilder
      var c = in.read()
      while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
      if (c == -1 && sb.isEmpty) throw new ImapException("connection closed")
      sb.toString
    }
    def readExact(n: Int): String = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val r = in.read(buf, off, n - off)
        if (r < 0) throw new ImapException("connection closed in literal")
        off += r
      }
      new String(buf, StandardCharsets.ISO_8859_1)
    }
    /** Send a command; returns the untagged lines before the tagged OK. */
    def cmd(c: String): Seq[String] = {
      tagN += 1
      val tag = s"a$tagN"
      out.write(s"$tag $c\r\n"); out.flush()
      val untagged = ListBuffer.empty[String]
      var line = readLine()
      while (!line.startsWith(tag + " ")) {
        untagged += line
        line = readLine()
      }
      if (!line.startsWith(s"$tag OK"))
        throw new ImapException(s"'$c' failed: $line")
      untagged.toSeq
    }

    try {
      val greeting = readLine()
      if (!greeting.startsWith("* OK")) throw new ImapException(s"bad greeting: $greeting")
      cmd(s"LOGIN ${cfg.user} ${cfg.pass}")
      cmd("SELECT INBOX")
      val unseen = cmd("SEARCH UNSEEN")
        .find(_.startsWith("* SEARCH"))
        .map(_.stripPrefix("* SEARCH").trim)
        .filter(_.nonEmpty)
        .map(_.split("\\s+").map(_.toInt).toSeq)
        .getOrElse(Seq.empty)

      unseen.foreach { seq =>
        // * <seq> FETCH (BODY[] {<n>}  — read n literal bytes, then the
        // closing line and the tagged OK.
        tagN += 1
        val tag = s"a$tagN"
        out.write(s"$tag FETCH $seq (BODY[])\r\n"); out.flush()
        var raw: String = null
        var line = readLine()
        while (!line.startsWith(tag + " ")) {
          val lit = line.lastIndexOf('{')
          if (line.startsWith("*") && lit >= 0 && line.endsWith("}")) {
            val n = line.substring(lit + 1, line.length - 1).toInt
            raw = readExact(n)
          }
          line = readLine()
        }
        if (!line.startsWith(s"$tag OK") || raw == null)
          throw new ImapException(s"FETCH $seq failed: $line")
        handle(FetchedMessage(seq, raw)) match {
          case Delete => cmd(s"STORE $seq +FLAGS (\\Deleted)")
          case Keep => () // server marked it \Seen on FETCH BODY[]
          case Unsee => cmd(s"STORE $seq -FLAGS (\\Seen)")
        }
      }
      if (unseen.nonEmpty) cmd("EXPUNGE")
      cmd("LOGOUT")
      unseen.size
    } finally socket.close()
  }
}

/** Just-enough RFC 822 parsing for the inbox path: header unfold + split,
  * address extraction, first-text-part extraction from multipart bodies.
  */
object Rfc822 {

  /** Split raw message into (lower-cased header map, body). */
  def split(raw: String): (Map[String, String], String) = {
    val norm = raw.replace("\r\n", "\n")
    val idx = norm.indexOf("\n\n")
    val (head, body) = if (idx < 0) (norm, "") else (norm.take(idx), norm.drop(idx + 2))
    // unfold: continuation lines start with space/tab
    val unfolded = head.replaceAll("\n[ \t]+", " ")
    val headers = unfolded.split("\n").flatMap { l =>
      val c = l.indexOf(':')
      if (c < 0) None else Some(l.take(c).trim.toLowerCase -> l.drop(c + 1).trim)
    }.toMap
    (headers, body)
  }

  /** `Name <a@b>` / `a@b` -> `a@b` (reference substring-on-`<` parse). */
  def address(v: String): String = {
    val lt = v.indexOf('<')
    if (lt >= 0 && v.indexOf('>', lt) > lt) v.substring(lt + 1, v.indexOf('>', lt))
    else v.trim
  }

  /** Text content: plain body for text types, else the first text/plain (or
    * failing that text/html) part of a multipart message, recursively —
    * reference `getTextFromMessage`/`getTextFromMimeMultipart`.
    */
  def text(contentType: String, body: String): String = {
    val ct = contentType.toLowerCase
    if (!ct.startsWith("multipart")) body.trim
    else {
      val b = boundary(contentType).getOrElse(return body.trim)
      val parts = body.split(java.util.regex.Pattern.quote("--" + b))
        .drop(1).takeWhile(p => !p.startsWith("--"))
      val parsed = parts.map(p => split(p.dropWhile(c => c == '\n' || c == '\r')))
      def partText(pred: String => Boolean): Option[String] =
        parsed.collectFirst {
          case (h, pb) if pred(h.getOrElse("content-type", "text/plain").toLowerCase) =>
            text(h.getOrElse("content-type", "text/plain"), pb)
        }
      partText(_.startsWith("text/plain"))
        .orElse(partText(_.startsWith("text/html")))
        .orElse(partText(_.startsWith("multipart")))
        .getOrElse("")
    }
  }

  def boundary(contentType: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("boundary=\"?([^\";]+)\"?", java.util.regex.Pattern.CASE_INSENSITIVE)
      .matcher(contentType)
    if (m.find()) Some(m.group(1)) else None
  }
}
