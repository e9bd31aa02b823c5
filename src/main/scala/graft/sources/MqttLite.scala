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
    // the 2-byte length prefix caps MQTT strings at 65535 bytes
    // (MQTT-1.5.3): silently truncating the prefix while appending all
    // the bytes emitted a corrupt frame (round-13 review). Raised as
    // IOException, not IllegalArgumentException: these guards fire on the
    // send path, and callers' reconnect handling catches IOException only
    // — a runtime exception would kill the worker thread instead of
    // routing through reconnect (round-13 ADVICE, same class as the
    // CONNECT handshake fix)
    if (b.length > 0xffff) throw new java.io.IOException(
      s"MQTT string exceeds 65535 UTF-8 bytes: ${b.length}")
    Array(((b.length >> 8) & 0xff).toByte, (b.length & 0xff).toByte) ++ b
  }

  private def writeRemainingLength(out: DataOutputStream, n0: Int): Unit = {
    // MQTT-2.2.3: the varint caps at 4 bytes = 268435455; a larger body
    // would emit an illegal 5-byte length. IOException for the same
    // send-path reconnect routing as utf8() above.
    if (n0 < 0 || n0 > 268435455)
      throw new java.io.IOException(s"MQTT body too large: $n0")
    var n = n0
    do {
      var digit = n % 128
      n /= 128
      if (n > 0) digit |= 0x80
      out.writeByte(digit)
    } while (n > 0)
  }

  private def readRemainingLength(in: DataInputStream): Int = {
    // MQTT-2.2.3: at most 4 length bytes (max 268435455). Unbounded,
    // malformed continuations overflowed Int (negative allocation), spun
    // forever on a 0x80 stream, or allocated up to 256 MB per crafted
    // packet (round-13 review). A 5th continuation byte is a protocol
    // error — IOException so the reconnect path handles it.
    var multiplier = 1; var value = 0; var digit = 0; var bytes = 0
    do {
      if (bytes == 4)
        throw new java.io.IOException("malformed MQTT remaining-length")
      digit = in.readUnsignedByte()
      value += (digit & 0x7f) * multiplier
      multiplier *= 128
      bytes += 1
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

  /** [[readPacket]] for a polling loop with a socket timeout: a timeout
    * BEFORE any header byte is idleness (None); a timeout AFTER the
    * header byte was consumed means the stream is committed to a frame
    * that stalled — treating that as idleness desynced the stream (the
    * next read parsed mid-frame bytes as a fixed header, which could
    * decode as a plausible PUBLISH and deliver corrupt rows; round-13
    * review) — so it raises IOException and the caller reconnects.
    */
  def readPacketOpt(in: DataInputStream): Option[Packet] = {
    val h =
      try in.readUnsignedByte()
      catch { case _: java.net.SocketTimeoutException => return None }
    try {
      val len = readRemainingLength(in)
      val body = new Array[Byte](len)
      in.readFully(body)
      Some(Packet(h >> 4, h & 0x0f, body))
    } catch {
      case _: java.net.SocketTimeoutException =>
        throw new java.io.IOException("mid-frame stall: stream desynced")
    }
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

  /** Decode a QoS-0 PUBLISH body into (topic, payload). Malformed
    * bodies (truncated topic length) raise IOException so the caller's
    * reconnect path — which catches IO, not IndexOutOfBounds — handles
    * them instead of the reader thread dying (round-13 review).
    */
  def decodePublish(body: Array[Byte]): (String, Array[Byte]) = {
    if (body.length < 2)
      throw new java.io.IOException("malformed PUBLISH: no topic length")
    val tlen = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
    if (2 + tlen > body.length)
      throw new java.io.IOException("malformed PUBLISH: topic overruns body")
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
class MqttClientLite(host: String, port: Int, clientId: String,
    keepAliveSec: Int = MqttClientLite.KeepAliveSec) {
  import MqttCodec._
  import MqttClientLite.PollTimeoutMs

  // the ping clock (keepalive/2 since last send) must be longer than the
  // poll sleep or the first ping fires after the broker already dropped
  // us — the "much shorter than any liveness bound" claim, enforced
  // (round-13 review; keepAliveSec <= 10 broke the arithmetic silently)
  require(keepAliveSec == 0 || keepAliveSec * 500L > PollTimeoutMs,
    s"keepAliveSec=$keepAliveSec too short for PollTimeoutMs=$PollTimeoutMs")

  private val socket = new Socket(host, port)
  // MQTT keepalive is about what the CLIENT sends (MQTT-3.1.2-24: the
  // broker disconnects a client it hears NOTHING from for 1.5x the
  // declared keepalive), so pinging must be driven by time-since-last-
  // SEND, not read-idle — a busy broker keeps the read side hot while
  // the client stays silent and gets dropped. The short poll timeout
  // exists only to wake the loop so both clocks are checked; liveness
  // itself rides the clocks: we ping at keepalive/2 since our last
  // send, and declare the connection dead after 1.5x keepalive with no
  // inbound traffic (half-open defense — a broker that dies without
  // FIN would otherwise block readLoop forever).
  socket.setSoTimeout(PollTimeoutMs)
  private val in = new DataInputStream(socket.getInputStream)
  private val out = new DataOutputStream(socket.getOutputStream)
  @volatile private var lastSendMs = System.currentTimeMillis()
  @volatile private var lastRecvMs = System.currentTimeMillis()

  // Concurrent writers (readLoop's timer-driven PINGREQs, close()'s
  // DISCONNECT from the stop() thread, external publish() callers) are
  // serialized inside writePacket itself — it holds `out`'s monitor for
  // the whole frame, so packets can never interleave mid-frame.
  private def send(ptype: Int, flags: Int, body: Array[Byte]): Unit = {
    writePacket(out, ptype, flags, body)
    lastSendMs = System.currentTimeMillis()
  }

  // A publish-only client (keepAliveSec=0) never runs readLoop, so nobody
  // would drive PINGREQs — declaring a nonzero keepalive it can't honor
  // gets it dropped by the broker after 1.5x and QoS-0 publishes silently
  // lost until the RST surfaces. 0 = keepalive disabled (MQTT-3.1.2-23).
  // handshake failures must CLOSE the socket (the caller never got the
  // reference, so its finally can close nothing — one fd leaked per
  // retry) and raise IOException (require threw IllegalArgumentException,
  // which escaped the reconnect path's IO catch and killed the reader
  // thread; round-13 review). The CONNACK return code is also checked:
  // a refused connection (code 1-5) was indistinguishable from a
  // healthy quiet broker.
  try {
    send(CONNECT, 0, connectBody(clientId, keepAliveSec))
    val ack = readPacket(in)
    if (ack.ptype != CONNACK)
      throw new java.io.IOException(s"expected CONNACK, got type ${ack.ptype}")
    val rc = if (ack.body.length >= 2) ack.body(1) & 0xff else -1
    if (rc != 0)
      throw new java.io.IOException(s"broker refused connection: code $rc")
  } catch {
    case e: Throwable =>
      try socket.close() catch { case _: java.io.IOException => () }
      throw e
  }
  lastRecvMs = System.currentTimeMillis()

  def subscribe(topicFilter: String): Unit = {
    send(SUBSCRIBE, 0x02, subscribeBody(1, topicFilter))
    // SUBACK may interleave with publishes; readLoop tolerates both
  }

  def publish(topic: String, payload: String): Unit =
    send(PUBLISH, 0,
      publishBody(topic, payload.getBytes(StandardCharsets.UTF_8)))

  /** Blocks until the socket closes (or the keepalive clocks declare it
    * dead), delivering each publish. A poll timeout that fires mid-frame
    * raises IOException directly ([[MqttCodec.readPacketOpt]]) — the
    * stream is desynced and must reconnect, never parse mid-frame bytes
    * as a header.
    */
  def readLoop(onMessage: (String, String) => Unit): Unit =
    try {
      while (true) {
        val p = readPacketOpt(in) // None = idle; mid-frame stall = IO
        p.foreach(_ => lastRecvMs = System.currentTimeMillis())
        val now = System.currentTimeMillis()
        if (keepAliveSec > 0) {
          if (now - lastRecvMs > keepAliveSec * 1500L)
            throw new EOFException("keepalive expired: no broker traffic")
          if (now - lastSendMs > keepAliveSec * 500L)
            send(PINGREQ, 0, Array.empty)
        }
        p.foreach { pkt =>
          pkt.ptype match {
            case PUBLISH =>
              val (topic, payload) = decodePublish(pkt.body)
              onMessage(topic, new String(payload, StandardCharsets.UTF_8))
            case PINGREQ => send(PINGRESP, 0, Array.empty)
            case SUBACK =>
              // grant codes follow the 2-byte packet id; 0x80 = broker
              // rejected the subscription (ACL-denied filter) — pre-fix
              // this was ignored and the query idled forever delivering
              // zero rows on a "connected" broker (round-13 review)
              if (pkt.body.drop(2).exists(b => (b & 0xff) == 0x80))
                throw new java.io.IOException(
                  "broker rejected subscription (SUBACK 0x80)")
            case _ => // PINGRESP/CONNACK duplicates ignored
          }
        }
      }
    } catch { case _: EOFException | _: java.io.IOException => }

  def close(): Unit = {
    try send(DISCONNECT, 0, Array.empty)
    catch { case _: java.io.IOException => }
    socket.close()
  }
}

object MqttClientLite {
  /** CONNECT keepalive: we promise the broker a send at least this
    * often (pings fire at half this since our last send); symmetric
    * half-open detection declares the broker dead after 1.5x this with
    * no inbound traffic.
    */
  final val KeepAliveSec = 60
  /** Poll timeout that wakes the read loop to check the clocks —
    * deliberately much shorter than any liveness bound so ping timing
    * never rides on it.
    */
  final val PollTimeoutMs = 5000
}
