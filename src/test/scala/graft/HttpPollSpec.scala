package graft

import java.io.OutputStreamWriter
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** Timed HTTP-GET source vs an embedded HTTP stub (the reference's Z3Api
  * poller, `Z3Api.java:25-47`): response lines become rows, the poll
  * repeats on the period, a failing endpoint yields no rows.
  */
class HttpPollSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("polled response lines become rows with the url as origin") {
    val server = new ServerSocket(0)
    val hits = new AtomicInteger(0)
    val acceptor = new Thread(() => {
      while (!server.isClosed) {
        try {
          val sock = server.accept()
          hits.incrementAndGet()
          // drain the request head
          val in = sock.getInputStream
          val sb = new StringBuilder
          def headDone = sb.length >= 4 && sb.substring(sb.length - 4) == "\r\n\r\n"
          var done = false
          while (!done) { // check right after append: no read past the head
            val c = in.read()
            if (c == -1) done = true
            else { sb.append(c.toChar); if (headDone) done = true }
          }
          val body = "depth=42.5\nheading=271\n"
          val bytes = body.getBytes(StandardCharsets.UTF_8)
          val out = new OutputStreamWriter(sock.getOutputStream, StandardCharsets.ISO_8859_1)
          out.write("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
            s"Content-Length: ${bytes.length}\r\nConnection: close\r\n\r\n")
          out.flush()
          sock.getOutputStream.write(bytes)
          sock.getOutputStream.flush()
          sock.close()
        } catch { case _: java.io.IOException => }
      }
    })
    acceptor.setDaemon(true); acceptor.start()

    val url = s"http://127.0.0.1:${server.getLocalPort}/status"
    val q = LineSources.httpPoll(spark, url, periodSeconds = 1)
      .writeStream.format("memory").queryName("http_poll_out")
      .outputMode("append").start()
    try {
      // plain polling: processAllAvailable never settles on a live rate
      // source (new ticks keep arriving), so wait on the sink table
      val deadline = System.currentTimeMillis() + 30000
      var rows = Array.empty[org.apache.spark.sql.Row]
      // at least two poll cycles: 4+ rows (2 lines per response)
      while (rows.length < 4 && System.currentTimeMillis() < deadline) {
        rows = spark.table("http_poll_out").collect()
        if (rows.length < 4) Thread.sleep(200)
      }
      assert(rows.length >= 4, s"expected >=4 rows, got ${rows.length}")
      assert(hits.get() >= 2, "endpoint should have been polled repeatedly")
      val lines = rows.map(_.getAs[String]("line")).distinct.sorted
      assert(lines.toSeq == Seq("depth=42.5", "heading=271"))
      assert(rows.forall(_.getAs[String]("origin") == url))
    } finally {
      q.stop()
      server.close()
    }
  }

  test("a dead endpoint yields no rows but the stream stays alive") {
    val dead = new ServerSocket(0)
    val port = dead.getLocalPort
    dead.close() // nothing listens here now
    val q = LineSources.httpPoll(spark, s"http://127.0.0.1:$port/x",
      periodSeconds = 1, timeoutMillis = 500)
      .writeStream.format("memory").queryName("http_poll_dead")
      .outputMode("append").start()
    try {
      Thread.sleep(2500)
      assert(q.isActive, "stream must survive connection failures")
      assert(spark.table("http_poll_dead").isEmpty)
    } finally q.stop()
  }
}
