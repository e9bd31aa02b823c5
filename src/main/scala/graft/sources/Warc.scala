package graft.sources

/** Minimal WARC (ISO 28500, the web-crawl interchange format) reader —
  * the ingest container of text training pipelines (Common Crawl ships
  * WARC). Public layout per record:
  *
  * {{{
  * WARC/1.0\r\n
  * <name>: <value>\r\n ...          (headers; Content-Length mandatory)
  * \r\n
  * <Content-Length bytes of block>
  * \r\n\r\n                         (record separator)
  * }}}
  *
  * For `response` records the block is an HTTP/1.1 message; the
  * status line and headers split from the payload at the first
  * \r\n\r\n. The walk is strict: a malformed length or missing
  * separator stops the scan rather than resyncing mid-payload (a
  * production reader would resync on the next "WARC/" magic — noted,
  * not needed for well-formed archives).
  */
object Warc {

  final case class WarcRecord(headers: Map[String, String], block: Array[Byte])

  final case class HttpResponse(status: Int, headers: Map[String, String],
      body: Array[Byte])

  private val Ascii = java.nio.charset.StandardCharsets.US_ASCII

  /** Walk every record of a WARC blob. */
  def records(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var ok = true
    while (ok && pos < bytes.length) {
      // skip inter-record CRLFs
      while (pos + 1 < bytes.length && bytes(pos) == '\r' && bytes(pos + 1) == '\n') pos += 2
      if (pos >= bytes.length) ok = false
      else readLine(bytes, pos) match {
        case Some((ver, p1)) if ver.startsWith("WARC/") =>
          var p = p1
          val hdrs = Map.newBuilder[String, String]
          var done = false
          var good = true
          while (!done && good) readLine(bytes, p) match {
            case Some(("", p2)) => p = p2; done = true
            case Some((l, p2)) =>
              val i = l.indexOf(':')
              if (i > 0) hdrs += l.substring(0, i).trim -> l.substring(i + 1).trim
              p = p2
            case None => good = false
          }
          val headers = hdrs.result()
          val len = headers.get("Content-Length").flatMap(_.toIntOption)
          (len, good) match {
            case (Some(n), true) if p + n <= bytes.length =>
              out += WarcRecord(headers, java.util.Arrays.copyOfRange(bytes, p, p + n))
              pos = p + n
            case _ => ok = false
          }
        case _ => ok = false
      }
    }
    out.result()
  }

  /** Split a `response` record's HTTP block. */
  def httpResponse(block: Array[Byte]): Option[HttpResponse] = {
    val sep = indexOfCrlfCrlf(block)
    if (sep < 0) return None
    val head = new String(block, 0, sep, Ascii)
    val lines = head.split("\r\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return None
    val status = lines(0).split(" ").lift(1).flatMap(_.toIntOption).getOrElse(-1)
    val hs = lines.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i > 0) Some(l.substring(0, i).trim -> l.substring(i + 1).trim) else None
    }.toMap
    Some(HttpResponse(status, hs,
      java.util.Arrays.copyOfRange(block, sep + 4, block.length)))
  }

  /** Writer for tests/fixtures: one response record. */
  private[graft] def encodeResponse(uri: String, status: Int,
      payload: Array[Byte]): Array[Byte] = {
    val http = (s"HTTP/1.1 $status OK\r\nContent-Type: text/plain\r\n\r\n")
      .getBytes(Ascii) ++ payload
    val hdr = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(Ascii)
    hdr ++ http ++ "\r\n\r\n".getBytes(Ascii)
  }

  private def readLine(b: Array[Byte], from: Int): Option[(String, Int)] = {
    var i = from
    while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
    if (i + 1 >= b.length) None
    else Some((new String(b, from, i - from, Ascii), i + 2))
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }
}
