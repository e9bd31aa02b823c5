package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.Socket
import java.nio.charset.StandardCharsets

/** Minimal MQTT 3.1.1 wire codec (public OASIS spec) — just enough of the
  * protocol for the graft S5/K7 roles: CONNECT/CONNACK, SUBSCRIBE/SUBACK,
  * QoS-0 PUBLISH, PINGREQ/PINGRESP, DISCONNECT. The container ships no
  * MQTT client jar, and the protocol is small enough that a hand-rolled
  * codec is simpler than carrying one.
  */
object MqttCodec {

  final val CONNECT = 1; final val CONNACK = 2; final val PUBLISH = 3
  final val SUBSCRIBE = 8; final val SUBACK = 9
  final val PINGREQ = 12; final val PINGRESP = 13; final val DISCONNECT = 14

  /** One decoded packet: type, flags, body (after the remaining-length). */
  final case class Packet(ptype: Int, flags: Int, body: Array[Byte])

  private def utf8(s: String): Array[Byte] = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    Array(((b.length >> 8) & 0xff).toByte, (b.length & 0xff).toByte) ++ b
  }

  private def writeRemainingLength(out: DataOutputStream, n0: Int): Unit = {
    var n = n0
    do {
      var digit = n % 128
      n /= 128
      if (n > 0) digit |= 0x80
      out.writeByte(digit)
    } while (n > 0)
  }

  private def readRemainingLength(in: DataInputStream): Int = {
    var multiplier = 1; var value = 0; var digit = 0
    do {
      digit = in.readUnsignedByte()
      value += (digit & 0x7f) * multiplier
      multiplier *= 128
    } while ((digit & 0x80) != 0)
    value
  }

  def writePacket(out: DataOutputStream, ptype: Int, flags: Int,
      body: Array[Byte]): Unit = out.synchronized {
    out.writeByte((ptype << 4) | (flags & 0x0f))
    writeRemainingLength(out, body.length)
    out.write(body)
    out.flush()
  }

  /** Blocking read of the next packet; throws EOFException on close. */
  def readPacket(in: DataInputStream): Packet = {
    val h = in.readUnsignedByte()
    val len = readRemainingLength(in)
    val body = new Array[Byte](len)
    in.readFully(body)
    Packet(h >> 4, h & 0x0f, body)
  }

  def connectBody(clientId: String, keepAliveSec: Int = 0): Array[Byte] =
    utf8("MQTT") ++ Array[Byte](4, 0x02) ++ // level 4, clean session
      Array(((keepAliveSec >> 8) & 0xff).toByte, (keepAliveSec & 0xff).toByte) ++
      utf8(clientId)

  def subscribeBody(packetId: Int, topicFilter: String): Array[Byte] =
    Array(((packetId >> 8) & 0xff).toByte, (packetId & 0xff).toByte) ++
      utf8(topicFilter) ++ Array[Byte](0) // QoS 0

  def publishBody(topic: String, payload: Array[Byte]): Array[Byte] =
    utf8(topic) ++ payload

  /** Decode a QoS-0 PUBLISH body into (topic, payload). */
  def decodePublish(body: Array[Byte]): (String, Array[Byte]) = {
    val tlen = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
    val topic = new String(body, 2, tlen, StandardCharsets.UTF_8)
    (topic, body.drop(2 + tlen))
  }

  /** MQTT topic-filter match: `+` single level, `#` multi-level tail. */
  def topicMatches(filter: String, topic: String): Boolean = {
    val f = filter.split("/", -1); val t = topic.split("/", -1)
    var i = 0
    while (i < f.length) {
      if (f(i) == "#") return true
      if (i >= t.length) return false
      if (f(i) != "+" && f(i) != t(i)) return false
      i += 1
    }
    f.length == t.length
  }
}

/** Tiny synchronous MQTT 3.1.1 client over a raw socket. One socket per
  * instance; `readLoop` blocks delivering QoS-0 publishes to the callback
  * (the subscribe role, reference `MqttWorker.messageArrived`:
  * payload -> line, topic -> label); `publish` is thread-safe (the K7
  * role, `Generic.java:329-330`).
  */
class MqttClientLite(host: String, port: Int, clientId: String) {
  import MqttCodec._
  import MqttClientLite.{KeepAliveSec, ReadTimeoutMs}

  private val socket = new Socket(host, port)
  // half-open-connection defense: without a read timeout, a broker that
  // dies without FIN (NAT timeout, power loss, partition) leaves
  // readLoop blocked FOREVER — the reconnect loop above it never fires
  // and the source silently stops ingesting. The timeout fires on an
  // idle socket; readLoop then pings, and a second silent interval
  // means the connection is dead.
  socket.setSoTimeout(ReadTimeoutMs)
  private val in = new DataInputStream(socket.getInputStream)
  private val out = new DataOutputStream(socket.getOutputStream)

  writePacket(out, CONNECT, 0, connectBody(clientId, KeepAliveSec))
  require(readPacket(in).ptype == CONNACK, "broker did not CONNACK")

  def subscribe(topicFilter: String): Unit = {
    writePacket(out, SUBSCRIBE, 0x02, subscribeBody(1, topicFilter))
    // SUBACK may interleave with publishes; readLoop tolerates both
  }

  def publish(topic: String, payload: String): Unit =
    writePacket(out, PUBLISH, 0,
      publishBody(topic, payload.getBytes(StandardCharsets.UTF_8)))

  /** Blocks until the socket closes (or the keepalive declares it
    * dead), delivering each publish. An idle read timeout sends a
    * PINGREQ; a second consecutive silent interval (no PINGRESP, no
    * traffic) means half-open — return so the caller's reconnect loop
    * takes over.
    */
  def readLoop(onMessage: (String, String) => Unit): Unit =
    try {
      var pinged = false
      while (true) {
        val p =
          try { val p0 = readPacket(in); pinged = false; Some(p0) }
          catch {
            case _: java.net.SocketTimeoutException =>
              if (pinged) throw new EOFException("keepalive expired")
              pinged = true
              writePacket(out, PINGREQ, 0, Array.empty)
              None
          }
        p.foreach { pkt =>
          pkt.ptype match {
            case PUBLISH =>
              val (topic, payload) = decodePublish(pkt.body)
              onMessage(topic, new String(payload, StandardCharsets.UTF_8))
            case PINGREQ => writePacket(out, PINGRESP, 0, Array.empty)
            case _ => // SUBACK/PINGRESP/CONNACK duplicates ignored
          }
        }
      }
    } catch { case _: EOFException | _: java.io.IOException => }

  def close(): Unit = {
    try writePacket(out, DISCONNECT, 0, Array.empty)
    catch { case _: java.io.IOException => }
    socket.close()
  }
}

object MqttClientLite {
  /** CONNECT keepalive: the broker drops us after 1.5x this of silence,
    * which is the liveness contract that makes half-open detection
    * symmetric.
    */
  final val KeepAliveSec = 60
  /** Socket read timeout — the client-side 1.5x-keepalive rule. */
  final val ReadTimeoutMs = 90000
}
