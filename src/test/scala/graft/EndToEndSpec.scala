package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{RtVals, RuleEngine, TaskRule, ValUpdate}
import graft.sources.MqttClientLite

/** The full §3.1 sensor-to-action loop composed from the engine's parts:
  * MQTT broker -> MqttLineSource -> settings.xml-declared path (filter +
  * math + typed store) -> rtvals state -> rule guard -> alert command
  * published back to the broker (K7 write-back) — the reference's whole
  * dataflow, one test.
  */
class EndToEndSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("mqtt sensor -> path -> rtvals -> rule -> publish-back loop") {
    import spark.implicits._
    val broker = new MiniMqttBroker
    try {
      // sensor plane: lines "temp,<v>" on sensors/ctd; path scales x10
      // and stores the typed value
      val spec = DcafsXml.parsePath(
        """<path id="ctd" delimiter=",">
          |  <filter type="start">temp</filter>
          |  <math>i1 = i1 * 10</math>
          |  <store><real index="1">temp</real></store>
          |</path>""".stripMargin)
      val src = spark.readStream
        .format("graft.sources.MqttLineSource")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "sensors/#").load()
      val parsed = PathCompiler.compile(spec, src) // StoreStep projects (line, temp)
      val updates = parsed
        .select($"temp").as[Double]
        .map(v => ValUpdate("ctd_temp", v, (v * 1000).toLong))
      val snapshots = RtVals.snapshots(updates)
      val rules = Seq(TaskRule("hot", "last >= 200", "fan:on"))
      val fired = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val pubBack = new MqttClientLite("127.0.0.1", broker.port, "actuator")
      val q = RuleEngine.run(snapshots, rules) { cmds =>
        cmds.foreach { c =>
          fired.add(c.command)
          pubBack.publish("actuators/fan", c.command) // K7 write-back
        }
      }.outputMode("update")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-e2e").toFile.getAbsolutePath)
        .start()
      try {
        Thread.sleep(500)
        val sensor = new MqttClientLite("127.0.0.1", broker.port, "sensor")
        sensor.publish("sensors/ctd", "temp,15.0")  // -> 150, below threshold
        sensor.publish("sensors/ctd", "status,ok")  // filtered out by the path
        sensor.publish("sensors/ctd", "temp,25.0")  // -> 250, fires the rule
        sensor.close()
        val deadline = System.currentTimeMillis() + 20000
        while (fired.isEmpty && System.currentTimeMillis() < deadline) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        assert(fired.toArray.toSeq == Seq("fan:on"), s"got $fired")
        // the actuator command made it back onto the broker
        val cmds = broker.received.toArray(Array.empty[(String, String)])
          .filter(_._1 == "actuators/fan")
        assert(cmds.map(_._2).toSeq == Seq("fan:on"))
      } finally { q.stop(); pubBack.close() }
    } finally broker.stop()
  }

  test("tcp sensor -> path -> rule -> email alert: the migrator's alert loop") {
    // the path a reference deployment hits first when it migrates: a
    // stream turns into rtvals, a rule guard trips, and the alert goes
    // out BY EMAIL through the worker (K8), end to end over real
    // sockets on both sides (graft TCP source in, SMTP out).
    import spark.implicits._
    val smtp = new MiniSmtpServer
    val server = new java.net.ServerSocket(0)
    try {
      val emailer = new graft.alerts.EmailWorker(
        outbox = graft.alerts.MailboxCfg("127.0.0.1", smtp.port, from = "graft@email.com"),
        sendSpacingMillis = 5, busyWindowMillis = 400, retryFirstMillis = 100)
      emailer.addTo("admin", "watch@x.com")

      val spec = DcafsXml.parsePath(
        """<path id="bilge" delimiter=",">
          |  <filter type="start">level</filter>
          |  <store><real index="1">depth</real></store>
          |</path>""".stripMargin)
      val src = spark.readStream
        .format("graft.sources.TcpLineSource")
        .option("host", "127.0.0.1").option("port", server.getLocalPort.toString)
        .load()
      val updates = PathCompiler.compile(spec, src)
        .select($"depth").as[Double]
        .map(v => ValUpdate("bilge_depth", v, (v * 1000).toLong))
      val rules = Seq(TaskRule("flood", "last >= 0.8",
        "email:admin,Bilge alarm,Depth critical"))
      val q = RuleEngine.run(RtVals.snapshots(updates), rules) { cmds =>
        cmds.foreach { c =>
          // the reference TaskManager EMAIL output: ref, subject, content
          val p = c.command.stripPrefix("email:").split(",", 3)
          emailer.sendEmail(
            graft.alerts.Email.to(p(0)).subject(p(1)).content(p(2)))
        }
      }.outputMode("update")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-e2e-mail").toFile.getAbsolutePath)
        .start()
      try {
        val client = server.accept()
        val out = new java.io.PrintWriter(client.getOutputStream, true)
        out.print("level,0.20\r\n"); out.flush() // calm
        out.print("level,0.95\r\n"); out.flush() // flooding -> alert
        val deadline = System.currentTimeMillis() + 20000
        while (smtp.received.isEmpty && System.currentTimeMillis() < deadline) {
          q.processAllAvailable(); Thread.sleep(100)
        }
        val (from, rcpts, msg) = smtp.received.peek()
        assert(from == "graft@email.com" && rcpts == Seq("watch@x.com"))
        assert(msg.contains("Subject: Bilge alarm") && msg.contains("Depth critical"))
        out.close(); client.close()
      } finally { q.stop(); emailer.stop() }
    } finally { server.close(); smtp.close() }
  }
}
