package graft

import java.io.{DataInputStream, DataOutputStream}
import java.net.{ServerSocket, Socket}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{MqttClientLite, MqttCodec}

/** Embedded QoS-0 MQTT 3.1.1 mini-broker for tests: CONNECT->CONNACK,
  * SUBSCRIBE->SUBACK + filter registration, PUBLISH fan-out to matching
  * subscribers, PINGREQ->PINGRESP.
  */
class MiniMqttBroker {
  import MqttCodec._

  private val server = new ServerSocket(0)
  def port: Int = server.getLocalPort
  private val subs = mutable.ListBuffer.empty[(String, DataOutputStream)]
  @volatile private var running = true
  val received = java.util.Collections.synchronizedList(
    new java.util.ArrayList[(String, String)]())

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => handle(sock))
        t.setDaemon(true)
        t.start()
      } catch { case _: java.io.IOException => }
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit = {
    val in = new DataInputStream(sock.getInputStream)
    val out = new DataOutputStream(sock.getOutputStream)
    try {
      while (true) {
        val p = readPacket(in)
        p.ptype match {
          case CONNECT =>
            writePacket(out, CONNACK, 0, Array[Byte](0, 0))
          case SUBSCRIBE =>
            val pid = p.body.take(2)
            val flen = ((p.body(2) & 0xff) << 8) | (p.body(3) & 0xff)
            val filter = new String(p.body, 4, flen, "UTF-8")
            subs.synchronized { subs += ((filter, out)) }
            writePacket(out, SUBACK, 0, pid ++ Array[Byte](0))
          case PUBLISH =>
            val (topic, payload) = decodePublish(p.body)
            received.add((topic, new String(payload, "UTF-8")))
            subs.synchronized {
              subs.filter(s => topicMatches(s._1, topic)).foreach { case (_, o) =>
                try writePacket(o, PUBLISH, 0, p.body)
                catch { case _: java.io.IOException => }
              }
            }
          case PINGREQ => writePacket(out, PINGRESP, 0, Array.empty)
          case DISCONNECT => sock.close(); return
          case _ =>
        }
      }
    } catch { case _: java.io.IOException => /* client gone */ }
  }

  def stop(): Unit = { running = false; server.close() }
}

class MqttSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("topic filter matching: exact, +, #") {
    import MqttCodec.topicMatches
    assert(topicMatches("a/b", "a/b"))
    assert(!topicMatches("a/b", "a/c"))
    assert(topicMatches("a/+/c", "a/x/c"))
    assert(!topicMatches("a/+/c", "a/x/y"))
    assert(topicMatches("a/#", "a/x/y"))
    assert(topicMatches("#", "anything/at/all"))
    assert(!topicMatches("a/#/b", "x"))
  }

  test("codec round-trip: encode/decode publish over a socket pair for random payloads") {
    import MqttCodec._
    val rnd = new scala.util.Random(7)
    val server = new java.net.ServerSocket(0)
    val client = new java.net.Socket("127.0.0.1", server.getLocalPort)
    val peer = server.accept()
    val out = new java.io.DataOutputStream(client.getOutputStream)
    val in = new java.io.DataInputStream(peer.getInputStream)
    try {
      (1 to 50).foreach { i =>
        val topic = s"t/${rnd.alphanumeric.take(1 + rnd.nextInt(30)).mkString}"
        // payloads incl. multi-byte UTF-8 and sizes crossing the 127/16383
        // remaining-length varint boundaries
        val payload = (rnd.alphanumeric.take(rnd.nextInt(300)).mkString
          + "°μ" * rnd.nextInt(50)) * (1 + rnd.nextInt(60))
        writePacket(out, PUBLISH, 0,
          publishBody(topic, payload.getBytes("UTF-8")))
        val p = readPacket(in)
        assert(p.ptype == PUBLISH)
        val (t, pl) = decodePublish(p.body)
        assert(t == topic, s"iter $i topic")
        assert(new String(pl, "UTF-8") == payload, s"iter $i payload len ${payload.length}")
      }
    } finally { client.close(); peer.close(); server.close() }
  }

  test("S5 mqtt source streams broker publishes as (line, topic) rows") {
    val broker = new MiniMqttBroker
    try {
      val df = spark.readStream
        .format("graft.sources.MqttLineSource")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "sensors/#")
        .load()
      val q = df.writeStream.format("memory").queryName("mqtt_in")
        .outputMode("append").start()
      try {
        // wait for the source to connect+subscribe, then publish
        Thread.sleep(500)
        val pub = new MqttClientLite("127.0.0.1", broker.port, "test-pub")
        pub.publish("sensors/ctd", "17.2,35.1")
        pub.publish("sensors/gps", "$GPGGA,x")
        pub.publish("other/ignored", "nope")
        pub.close()
        val deadline = System.currentTimeMillis() + 15000
        var rows = Array.empty[org.apache.spark.sql.Row]
        while (rows.length < 2 && System.currentTimeMillis() < deadline) {
          q.processAllAvailable()
          rows = spark.table("mqtt_in").collect()
          if (rows.length < 2) Thread.sleep(100)
        }
        val got = rows.map(r => (r.getAs[String]("topic"), r.getAs[String]("line")))
          .sortBy(_._1).toSeq
        assert(got == Seq(("sensors/ctd", "17.2,35.1"), ("sensors/gps", "$GPGGA,x")),
          s"got $got")
      } finally q.stop()
    } finally broker.stop()
  }

  test("mqtt source restart resumes from checkpoint without duplicates") {
    val broker = new MiniMqttBroker
    try {
      val ckpt = java.nio.file.Files.createTempDirectory("graft-mqtt-ck")
        .toFile.getAbsolutePath
      val received = java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
      def startQuery() = spark.readStream
        .format("graft.sources.MqttLineSource")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "s/#").option("clientid", "restart-test")
        .load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.collect().foreach(r => received.add(r.getAs[String]("line")))
        }
        .option("checkpointLocation", ckpt).start()
      def await(q: org.apache.spark.sql.streaming.StreamingQuery, n: Int): Unit = {
        val deadline = System.currentTimeMillis() + 15000
        while (received.size < n && System.currentTimeMillis() < deadline) {
          q.processAllAvailable(); Thread.sleep(100)
        }
      }
      val q1 = startQuery()
      try {
        Thread.sleep(500)
        val pub = new MqttClientLite("127.0.0.1", broker.port, "pub1")
        pub.publish("s/a", "m1"); pub.publish("s/a", "m2"); pub.close()
        await(q1, 2)
        assert(received.toArray(Array.empty[String]).sorted.toSeq == Seq("m1", "m2"))
      } finally q1.stop()
      received.clear()
      val q2 = startQuery()
      try {
        Thread.sleep(500)
        val pub = new MqttClientLite("127.0.0.1", broker.port, "pub2")
        pub.publish("s/a", "m3"); pub.close()
        await(q2, 1)
        assert(received.toArray(Array.empty[String]).toSeq == Seq("m3"),
          s"expected only the new message, got $received")
      } finally q2.stop()
    } finally broker.stop()
  }

  test("K7 mqtt publish sink delivers stream output to the broker") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    import spark.implicits._
    val broker = new MiniMqttBroker
    try {
      val mem = MemoryStream[String]
      val df = mem.toDF().toDF("line")
      val ckpt = java.nio.file.Files.createTempDirectory("graft-mqtt-pub")
        .toFile.getAbsolutePath
      val q = LineSinks.mqttPublish(df, "127.0.0.1", broker.port, "out/data")
        .option("checkpointLocation", ckpt).start()
      try {
        mem.addData("r1", "r2")
        q.processAllAvailable()
        val deadline = System.currentTimeMillis() + 10000
        while (broker.received.size < 2 && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        val got = broker.received.toArray(Array.empty[(String, String)]).sortBy(_._2).toSeq
        assert(got == Seq(("out/data", "r1"), ("out/data", "r2")), s"got $got")
      } finally q.stop()
    } finally broker.stop()
  }
}
