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
}
