package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Standalone boot (`GraftApp.boot`, the DAS.java analog): a settings.xml
  * with a `<telnet>` node boots the console server on that node's port;
  * a real client connects, gets the configured title in the banner, and
  * runs a command end to end.
  */
class GraftAppSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("boot serves the console on the settings <telnet> node") {
    val xml =
      """<dcafs>
        |  <settings><telnet port="0" title="bootbox"/></settings>
        |</dcafs>""".stripMargin
    val f = Files.createTempFile("graft-app", ".xml")
    Files.write(f, xml.getBytes(StandardCharsets.UTF_8))
    // a uniquely-named view makes the ss listing deterministic: under the
    // full suite the shared session carries other suites' memory-sink
    // views, so "no registered streams" never appears — scan for the
    // marker instead
    spark.range(1).createOrReplaceTempView("bootbox_marker_view")
    val (_, server) = GraftApp.boot(spark, Some(f.toString))
    try {
      // port="0" -> ephemeral bind; boundPort is the real one
      val socket = new Socket("127.0.0.1", server.boundPort)
      try {
        socket.setSoTimeout(60000)
        val in = new BufferedReader(
          new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
        val out = new PrintWriter(socket.getOutputStream, true)
        val banner = in.readLine()
        assert(banner.contains("bootbox"), s"telnet title not applied: $banner")
        in.readLine() // hint line
        out.println("ss")
        val deadline = System.currentTimeMillis() + 60000
        var line = in.readLine()
        while (line != null && !line.contains("bootbox_marker_view") &&
            System.currentTimeMillis() < deadline) line = in.readLine()
        assert(line != null && line.contains("bootbox_marker_view"),
          "ss listing never showed the marker view over the booted socket")
      } finally socket.close()
    } finally {
      server.stop()
      Files.deleteIfExists(f)
    }
  }
}
