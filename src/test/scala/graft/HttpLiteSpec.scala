package graft

import java.io.{BufferedReader, InputStreamReader, OutputStream}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.alerts.HttpLite

/** The zero-dependency HTTP client against an embedded socket server —
  * all three response framings a real homeserver can send.
  */
class HttpLiteSpec extends AnyFunSuite {

  /** Serve exactly one request with a canned raw response. */
  private def withServer(raw: String)(f: Int => Unit): Unit = {
    val ss = new ServerSocket(0)
    val t = new Thread(() => {
      val s = ss.accept()
      val in = new BufferedReader(
        new InputStreamReader(s.getInputStream, StandardCharsets.ISO_8859_1))
      var line = in.readLine()
      while (line != null && line.nonEmpty) line = in.readLine() // drain headers
      val out: OutputStream = s.getOutputStream
      out.write(raw.getBytes(StandardCharsets.ISO_8859_1))
      out.flush()
      s.close()
    })
    t.setDaemon(true); t.start()
    try f(ss.getLocalPort) finally ss.close()
  }

  test("content-length framed body") {
    withServer(
      "HTTP/1.1 200 OK\r\nContent-Length: 11\r\n\r\nhello world") { port =>
      val r = HttpLite.get(s"http://127.0.0.1:$port/x")
      assert(r.status == 200 && r.body == "hello world")
    }
  }

  test("chunked transfer-encoding reassembles the payload") {
    // round-11 review finding: a chunked response (what Synapse behind
    // nginx sends — no Content-Length) fell into read-until-close and
    // returned hex size lines interleaved with the payload, breaking
    // every Matrix JSON parse
    withServer(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
        "5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n") { port =>
      val r = HttpLite.get(s"http://127.0.0.1:$port/x")
      assert(r.status == 200)
      assert(r.body == "hello world", s"got '${r.body}'")
    }
  }

  test("chunked with extension and trailer headers") {
    withServer(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
        "b;ext=1\r\n{\"ok\":true}\r\n0\r\nX-Trailer: t\r\n\r\n") { port =>
      val r = HttpLite.get(s"http://127.0.0.1:$port/x")
      assert(r.body == "{\"ok\":true}")
    }
  }

  test("read-until-close framing still works") {
    withServer("HTTP/1.1 200 OK\r\n\r\nstream-tail") { port =>
      val r = HttpLite.get(s"http://127.0.0.1:$port/x")
      assert(r.body == "stream-tail")
    }
  }
}
