package graft.sources

/** Vendor serial framing codecs — replay-grammar analogs of [[I2cScript]]
  * for the reference's two quirk serial streams. The bus I/O half is
  * hardware-gated like the rest of the serial family; these codecs are the
  * full byte-level protocol, so recorded captures replay through the same
  * decode a live port would use.
  *
  * Seasun (`/root/reference/src/io/stream/serialport/SeasunStream.java:31-73`):
  * a self-synchronizing 3-byte frame. Bytes 0 and 1 must be ODD (bit0 is
  * the "high part" marker, stripped by storing val-1), byte 2 must be EVEN
  * (stored as val/2); any violation resets the scanner. A complete frame
  * decodes to value = rec0/2 + (rec1<<6) + ((rec2%4)<<14) and
  * addr = rec2/4, forwarded as the line "addr;value" (`:63-69`).
  *
  * Multiplex (`MultiStream.java:36-104`): N physical ports merged behind
  * one serial line. Frame = 6-byte header `_(**)_` whose two wildcard
  * bytes are [2]=device id and [3]=payload length, then `len` payload
  * bytes; the payload string is forwarded with origin `id:<device>`
  * (`:52-54`). A header mismatch resets the scan, re-considering the
  * failed byte as a new frame start (`:68-72`).
  */
object VendorSerial {

  /** Stateful Seasun scanner: feed byte chunks in arrival order, collect
    * decoded "addr;value" lines. State is 3 ints — the same bounded
    * footprint as the reference's instance fields.
    */
  final class SeasunDecoder {
    private val rec = new Array[Int](3)
    private var good = 0

    def feed(data: Array[Byte]): Seq[String] = {
      val out = Seq.newBuilder[String]
      var k = 0
      while (k < data.length) {
        val v = data(k) & 0xff
        if (good <= 1) {
          if (v % 2 == 1) { rec(good) = v - 1; good += 1 }
          else good = 0
        } else {
          if (v % 2 == 0) { rec(2) = v / 2; good += 1 }
          else good = 0
        }
        if (good == 3) {
          good = 0
          val value = rec(0) / 2 + (rec(1) << 6) + ((rec(2) % 4) << 14)
          val addr = rec(2) / 4
          out += s"$addr;$value"
        }
        k += 1
      }
      out.result()
    }
  }

  /** Stateful multiplex scanner: feed byte chunks, collect
    * (deviceId, payload) messages. Buffer is bounded at 512 bytes like the
    * reference's `rec`; an oversized length byte can never exceed it
    * (255 + 6 < 512).
    */
  final class MultiplexDecoder {
    private val header = Array[Byte]('_', '(', '*', '*', ')', '_')
    private val rec = new Array[Byte](512)
    private var pos = 0

    def feed(data: Array[Byte]): Seq[(Char, String)] = {
      val out = Seq.newBuilder[(Char, String)]
      var k = 0
      while (k < data.length) {
        val b = data(k)
        if (pos >= header.length || b == header(pos) || header(pos) == '*') {
          rec(pos) = b
          pos += 1
          val len = rec(3) & 0xff
          if (pos >= header.length && pos >= len + header.length) {
            out += (((rec(2) & 0xff).toChar,
              new String(rec, header.length, len, "ISO-8859-1")))
            pos = 0
          }
        } else if (pos != 0) {
          pos = 0
          if (b == header(0)) { rec(0) = b; pos = 1 }
        }
        k += 1
      }
      out.result()
    }
  }

  /** Encode one multiplex message the way the reference writes it
    * (`MultiStream.java:93-104`): header with id and length filled in,
    * then the payload. Messages over 255 bytes are refused (length is one
    * byte).
    */
  def multiplexEncode(deviceId: Char, message: String): Option[Array[Byte]] = {
    val bytes = message.getBytes("ISO-8859-1")
    if (bytes.length > 255) None
    else Some(Array[Byte]('_', '(', deviceId.toByte, bytes.length.toByte, ')', '_') ++ bytes)
  }
}
