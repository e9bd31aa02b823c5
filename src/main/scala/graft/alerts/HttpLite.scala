package graft.alerts

import java.io.{BufferedInputStream, OutputStreamWriter}
import java.net.{Socket, URI}
import java.nio.charset.StandardCharsets

/** Minimal HTTP/1.1 client over plain sockets — just enough verbs and
  * framing for the Matrix client-server API the reference uses
  * (`/root/reference/src/io/matrix/MatrixClient.java` rides
  * java.net.http; this stays zero-dependency like the SMTP/IMAP/MQTT
  * codecs). Supports http URLs; response bodies may be Content-Length
  * framed, chunked (RFC 9112 §7.1 — what a homeserver behind nginx
  * actually sends), or read-until-close.
  */
object HttpLite {

  final case class Response(status: Int, body: String)

  /** Raw-byte response for media transfers (Matrix up/download). */
  final case class BinaryResponse(status: Int, bytes: Array[Byte])

  final class HttpException(msg: String) extends RuntimeException(msg)

  def get(url: String, timeoutMillis: Int = 15000): Response =
    request("GET", url, None, timeoutMillis)

  def post(url: String, json: String, timeoutMillis: Int = 15000): Response =
    request("POST", url, Some(json), timeoutMillis)

  def put(url: String, json: String, timeoutMillis: Int = 15000): Response =
    request("PUT", url, Some(json), timeoutMillis)

  /** POST an opaque payload (media upload); response body is JSON text. */
  def postBytes(url: String, payload: Array[Byte],
      contentType: String = "application/octet-stream",
      timeoutMillis: Int = 15000): Response = {
    val r = requestBytes("POST", url, payload, contentType, timeoutMillis)
    Response(r.status, new String(r.bytes, StandardCharsets.UTF_8))
  }

  /** GET an opaque payload (media download). */
  def getBytes(url: String, timeoutMillis: Int = 15000): BinaryResponse =
    requestBytes("GET", url, Array.emptyByteArray, "", timeoutMillis)

  def request(method: String, url: String, body: Option[String],
      timeoutMillis: Int): Response = {
    val r = requestBytes(method, url,
      body.map(_.getBytes(StandardCharsets.UTF_8)).getOrElse(Array.emptyByteArray),
      "application/json", timeoutMillis)
    Response(r.status, new String(r.bytes, StandardCharsets.UTF_8))
  }

  private def requestBytes(method: String, url: String, bytes: Array[Byte],
      contentType: String, timeoutMillis: Int): BinaryResponse = {
    val uri = new URI(url)
    require(uri.getScheme == "http", s"only http supported, got $url")
    val port = if (uri.getPort > 0) uri.getPort else 80
    val socket = new Socket(uri.getHost, port)
    socket.setSoTimeout(timeoutMillis)
    try {
      val out = new OutputStreamWriter(socket.getOutputStream, StandardCharsets.ISO_8859_1)
      val pathQ = uri.getRawPath + Option(uri.getRawQuery).map("?" + _).getOrElse("")
      out.write(s"$method $pathQ HTTP/1.1\r\n")
      out.write(s"Host: ${uri.getHost}:$port\r\n")
      out.write("Connection: close\r\n")
      if (bytes.nonEmpty) {
        out.write(s"Content-Type: $contentType\r\n")
        out.write(s"Content-Length: ${bytes.length}\r\n")
      }
      out.write("\r\n")
      out.flush()
      if (bytes.nonEmpty) { socket.getOutputStream.write(bytes); socket.getOutputStream.flush() }

      val in = new BufferedInputStream(socket.getInputStream)
      def readLine(): String = {
        val sb = new StringBuilder
        var c = in.read()
        while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
        sb.toString
      }
      val statusLine = readLine()
      if (!statusLine.startsWith("HTTP/")) throw new HttpException(s"bad status: $statusLine")
      val status = statusLine.split(" ")(1).toInt
      var contentLength = -1
      var chunked = false
      var line = readLine()
      while (line.nonEmpty) {
        val c = line.indexOf(':')
        if (c > 0 && line.take(c).equalsIgnoreCase("content-length"))
          contentLength = line.drop(c + 1).trim.toInt
        if (c > 0 && line.take(c).equalsIgnoreCase("transfer-encoding") &&
            line.drop(c + 1).trim.equalsIgnoreCase("chunked"))
          chunked = true
        line = readLine()
      }
      def readN(n: Int): Array[Byte] = {
        val buf = new Array[Byte](n)
        var off = 0
        while (off < n) {
          val r = in.read(buf, off, n - off)
          if (r < 0) throw new HttpException("short body")
          off += r
        }
        buf
      }
      val bodyBytes =
        if (chunked) {
          // RFC 9112 §7.1 framing: a real homeserver behind nginx
          // replies chunked with no Content-Length — falling into the
          // read-until-close branch would interleave hex size lines
          // with the payload and corrupt every JSON body
          val outBuf = new java.io.ByteArrayOutputStream()
          var sz = Integer.parseInt(readLine().split(";")(0).trim, 16)
          while (sz > 0) {
            outBuf.write(readN(sz))
            readLine() // CRLF after each chunk
            sz = Integer.parseInt(readLine().split(";")(0).trim, 16)
          }
          // trailers (if any) up to the blank line
          var t = readLine()
          while (t.nonEmpty) t = readLine()
          outBuf.toByteArray
        } else if (contentLength >= 0) readN(contentLength)
        else in.readAllBytes() // Connection: close framing
      BinaryResponse(status, bodyBytes)
    } finally socket.close()
  }
}
