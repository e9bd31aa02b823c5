package graft

import java.io.PrintWriter
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.console.{ConsoleServer, GraftConsole}

/** The reference's front door end-to-end: a real client `Socket` against
  * the telnet-style [[ConsoleServer]] — connect, banner, commands, SQL,
  * live `raw:` subscription push, unsubscribe, exit
  * (`TelnetServer.java:29`, `StreamManager.java:618` semantics).
  */
class ConsoleServerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Attach a background reader draining everything the server sends into
    * one growing transcript; assertions poll for substrings (prompts are
    * written without trailing newlines, so line-reads would be brittle).
    */
  private class Transcript(socket: Socket) {
    private val sb = new StringBuilder
    private val t = new Thread(() => {
      try {
        val in = socket.getInputStream
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n != -1) {
          sb.synchronized(sb.append(new String(buf, 0, n, StandardCharsets.UTF_8)))
          n = in.read(buf)
        }
      } catch { case _: java.io.IOException => }
    })
    t.setDaemon(true); t.start()

    def text: String = sb.synchronized(sb.toString)
    def length: Int = sb.synchronized(sb.length)

    def awaitContains(s: String, timeoutMs: Long = 15000): Unit = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!text.contains(s) && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(text.contains(s), s"transcript never contained '$s'; got:\n$text")
    }
  }

  test("real socket client: banner, ss listing, SQL passthrough, exit") {
    import spark.implicits._
    Seq(("dock", 1)).toDF("name", "n").createOrReplaceTempView("console_srv_dock")

    val server = new ConsoleServer(spark, new GraftConsole(spark)).start()
    val client = new Socket("127.0.0.1", server.boundPort)
    val out = new PrintWriter(client.getOutputStream, true)
    val tx = new Transcript(client)
    try {
      tx.awaitContains("Welcome to graft!")
      out.println("ss")
      tx.awaitContains("console_srv_dock")
      out.println("SELECT 41 + 1 AS answer")
      tx.awaitContains("answer")
      tx.awaitContains("42")
      out.println("exit")
      tx.awaitContains("Bye!")
    } finally {
      client.close()
      server.stop()
    }
  }

  test("raw:<id> on a streaming view pushes live lines until stop") {
    // a mini "sensor": the console's pump connects here and receives lines
    val sensor = new ServerSocket(0)
    @volatile var sensorOut: PrintWriter = null
    val accept = new Thread(() => {
      try {
        val s = sensor.accept()
        sensorOut = new PrintWriter(s.getOutputStream, true)
      } catch { case _: java.io.IOException => }
    })
    accept.setDaemon(true); accept.start()

    LineSources.socket(spark, "127.0.0.1", sensor.getLocalPort)
      .createOrReplaceTempView("console_srv_sensor")

    val server = new ConsoleServer(spark, new GraftConsole(spark)).start()
    val client = new Socket("127.0.0.1", server.boundPort)
    val out = new PrintWriter(client.getOutputStream, true)
    val tx = new Transcript(client)
    def hubCheckpointDirs(): Set[String] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir")))
      try s.map[String](_.getFileName.toString).toArray.map(_.toString)
        .filter(_.startsWith("graft-hub-console_srv_sensor")).toSet
      finally s.close()
    }
    try {
      tx.awaitContains("Welcome")
      val dirsBefore = hubCheckpointDirs() // stale dirs from older runs
      out.println("raw:console_srv_sensor")
      tx.awaitContains("Request for raw:console_srv_sensor ok")
      assert(hubCheckpointDirs().size > dirsBefore.size, "pump created no checkpoint")
      // subscription started the pump query, which connects to the sensor
      val deadline = System.currentTimeMillis() + 15000
      while (sensorOut == null && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(sensorOut != null, "pump query never connected to the sensor")
      sensorOut.println("$GPGGA,fix,1")
      sensorOut.println("$GPGGA,fix,2")
      tx.awaitContains("$GPGGA,fix,1")
      tx.awaitContains("$GPGGA,fix,2")

      // empty line / stop detaches this client (StreamManager:621)
      out.println("stop")
      tx.awaitContains("Ok.")
      val lenAfterStop = tx.length
      sensorOut.println("$GPGGA,fix,3")
      Thread.sleep(1500) // give the pump time to (wrongly) push
      assert(!tx.text.contains("$GPGGA,fix,3"),
        "line arrived after unsubscribe")
      // last listener detached -> the pump query was reaped and its temp
      // checkpoint dir deleted (no /tmp accretion per once-subscribed view)
      assert(!spark.streams.active.exists(q =>
        Option(q.name).exists(_ == "graft_hub_console_srv_sensor")),
        "pump query still running after last listener detached")
      assert(hubCheckpointDirs() == dirsBefore,
        "pump checkpoint dir leaked after last listener detached")
      // the session is still a working console after unsubscribing
      out.println("SELECT 'still-alive' AS tag")
      tx.awaitContains("still-alive")
      assert(tx.length > lenAfterStop)
    } finally {
      client.close()
      server.stop()
      sensor.close()
    }
  }

  test("telnet CLI: IAC negotiation, echo, backspace, arrows, history recall") {
    val server = new ConsoleServer(spark, new GraftConsole(spark)).start()
    val client = new Socket("127.0.0.1", server.boundPort)
    val raw = client.getOutputStream
    val tx = new Transcript(client)
    def send(bytes: Int*): Unit = { bytes.foreach(b => raw.write(b)); raw.flush() }
    def sendStr(s: String): Unit = { raw.write(s.getBytes(StandardCharsets.UTF_8)); raw.flush() }
    try {
      tx.awaitContains("Welcome to graft!")
      // a real telnet client negotiates: IAC DO ECHO. The server must
      // reply IAC WILL SGA + IAC WILL ECHO (CommandLineInterface.java:23-26)
      send(0xFF, 0xFD, 0x01)
      val deadline = System.currentTimeMillis() + 15000
      while (!tx.text.contains("\ufffd") && // IAC replies are invalid UTF-8 -> replacement chars
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(tx.text.contains("\ufffd"), "no telnet negotiation reply")

      // char-at-a-time with a typo fixed by backspace: "sx" BS "t" -> "st"
      sendStr("sx")
      tx.awaitContains("sx") // server-side echo active
      send(127)              // backspace
      sendStr("t")
      sendStr("\r\n")
      tx.awaitContains("no active streaming queries")

      // arrow-up recalls "st" (history), CR runs it again
      val before = tx.text.split("no active streaming queries", -1).length - 1
      send(27, '[', 'A') // ESC[A
      tx.awaitContains("\r>st") // history repaint
      sendStr("\r\n")
      val d2 = System.currentTimeMillis() + 15000
      while (tx.text.split("no active streaming queries", -1).length - 1 <= before &&
        System.currentTimeMillis() < d2) Thread.sleep(50)
      assert(tx.text.split("no active streaming queries", -1).length - 1 == before + 1,
        "history recall did not re-execute the command")

      // cursor-left + forward-delete: type "sst", move left twice beyond
      // the tail, delete the leading duplicate: "sst" -> left,left -> del
      // under cursor eats one 's' -> "st"
      sendStr("xst")
      send(27, '[', 'D'); send(27, '[', 'D'); send(27, '[', 'D') // to col 0
      send(27, '[', '3', '~') // ESC[3~ forward delete 'x'
      sendStr("\r\n")
      val d3 = System.currentTimeMillis() + 15000
      while (tx.text.split("no active streaming queries", -1).length - 1 <= before + 1 &&
        System.currentTimeMillis() < d3) Thread.sleep(50)
      assert(tx.text.split("no active streaming queries", -1).length - 1 == before + 2,
        s"edited line did not execute as st; transcript tail: ${tx.text.takeRight(200)}")
    } finally {
      client.close()
      server.stop()
    }
  }

  test("raw: on a missing view fails; on a batch view samples") {
    import spark.implicits._
    Seq("b1", "b2").toDF("line").createOrReplaceTempView("console_srv_batch")

    val server = new ConsoleServer(spark, new GraftConsole(spark)).start()
    val client = new Socket("127.0.0.1", server.boundPort)
    val out = new PrintWriter(client.getOutputStream, true)
    val tx = new Transcript(client)
    try {
      tx.awaitContains("Welcome")
      out.println("raw:console_srv_nope")
      tx.awaitContains("Request for raw:console_srv_nope failed")
      out.println("raw:console_srv_batch")
      tx.awaitContains("b1")
      tx.awaitContains("b2")
    } finally {
      client.close()
      server.stop()
    }
  }
}
