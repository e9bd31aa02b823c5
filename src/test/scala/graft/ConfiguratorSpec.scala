package graft

import java.io.PrintWriter
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.console.{Configurator, ConsoleServer, GraftConsole}

/** Settings wizard (reference `das/Configurator.java`): question/answer
  * flow with defaults, regex re-asks, XML merge, and the telnet-session
  * integration (`cfg` over a real socket).
  */
class ConfiguratorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("wizard builds a stream node; defaults and regex checks apply") {
    val f = Files.createTempDirectory("graft-cfg").resolve("settings.xml")
    val w = new Configurator(f)
    assert(w.start().contains("which module"))
    // unknown module re-asks
    assert(w.reply("nope")._1.contains("No such module"))
    assert(w.reply("stream")._1.contains("Stream id"))
    // required: empty id re-asks
    assert(w.reply("")._1.contains("required"))
    // regex: bad id re-asks
    assert(w.reply("bad id!")._1.contains("doesn't match"))
    assert(w.reply("ctd")._1.contains("Type"))
    // regex on enumerated type
    assert(w.reply("smoke-signals")._1.contains("doesn't match"))
    assert(w.reply("tcp")._1.contains("Address"))
    assert(w.reply("sensor-gw:4001")._1.contains("Label"))
    assert(w.reply("gps")._1.contains("EOL"))
    val (done, finished) = w.reply("") // default crlf
    assert(done.contains("Written <stream>") && !finished)

    val settings = DcafsXml.parseSettings(
      new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
    assert(settings.streams.map(s => (s.id, s.kind, s.host, s.port, s.label, s.eol)) ==
      Seq(("ctd", "tcp", "sensor-gw", 4001, "gps", "crlf")))

    // a second pass merges instead of clobbering, and telnet node lands
    assert(w.reply("telnet")._1.contains("Port"))
    assert(w.reply("9999")._1.contains("Title"))
    assert(w.reply("")._1.contains("Written <telnet>"))
    val xml = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
    assert(DcafsXml.parseSettings(xml).streams.size == 1)
    assert(DcafsXml.parseTelnet(xml).contains((9999, "graft")))
    assert(w.reply("exit") == ("Configurator closed.", true))
  }

  test("cfg over a real socket session configures, then the console resumes") {
    val dir = Files.createTempDirectory("graft-cfg-net")
    val f = dir.resolve("settings.xml")
    val server = new ConsoleServer(spark, new GraftConsole(spark)).start()
    val client = new Socket("127.0.0.1", server.boundPort)
    val out = new PrintWriter(client.getOutputStream, true)
    val sb = new StringBuilder
    val t = new Thread(() => {
      try {
        val in = client.getInputStream
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n != -1) {
          sb.synchronized(sb.append(new String(buf, 0, n, StandardCharsets.UTF_8)))
          n = in.read(buf)
        }
      } catch { case _: java.io.IOException => }
    })
    t.setDaemon(true); t.start()
    def await(s: String): Unit = {
      val deadline = System.currentTimeMillis() + 15000
      while (!sb.synchronized(sb.toString).contains(s) &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(sb.synchronized(sb.toString).contains(s),
        s"never saw '$s' in:\n${sb.synchronized(sb.toString)}")
    }
    try {
      await("Welcome")
      out.println(s"cfg,$f")
      await("which module")
      out.println("stream")
      await("Stream id")
      out.println("depth")
      await("Type")
      out.println("udp")
      await("Address")
      out.println("0.0.0.0:9877")
      await("Label")
      out.println("sonar")
      await("EOL")
      out.println("lf")
      await("Written <stream>")
      out.println("exit") // leaves the wizard, not the session
      await("Configurator closed.")
      out.println("SELECT 'post-wizard' AS tag")
      await("post-wizard")

      val settings = DcafsXml.parseSettings(
        new String(Files.readAllBytes(f), StandardCharsets.UTF_8))
      assert(settings.streams.map(s => (s.id, s.kind, s.port, s.label, s.eol)) ==
        Seq(("depth", "udp", 9877, "sonar", "lf")))
    } finally {
      client.close()
      server.stop()
    }
  }
}
