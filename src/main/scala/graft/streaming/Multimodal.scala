package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal-column plumbing (builder-prompt first-class set): media
  * payloads travel as opaque binary columns with typed metadata; decode /
  * feature-extract / frame-sample run as partition-wise transforms so a
  * real decoder (libjpeg/ffmpeg via JNI or a Python worker) initializes
  * once per partition, not per row.
  *
  * The decode step itself is STUBBED deterministically — the image/audio
  * libs are not in this container — but everything Spark-side is real:
  * schemas, encoders, partition-wise batching, the per-partition
  * init-once pattern, and the frame-explosion shape.
  */
final case class MediaRecord(
    id: Long, kind: String, bytes: Array[Byte], tags: Map[String, String])

final case class MediaFeatures(
    id: Long, kind: String, byteLen: Int, contentHash: String,
    width: Int, height: Int, nFrames: Int, byteHistogram: Array[Double])

final case class FrameSample(id: Long, frameIdx: Int, frameBytes: Array[Byte])

object Multimodal {

  implicit private val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
  implicit private val frameEnc: Encoder[FrameSample] = Encoders.product[FrameSample]

  /** Real header decode — pure JVM, no codec libs needed: PPM P6
    * (comment-free headers), BMP, PNG (IHDR width/height, big-endian at
    * offset 16/20 per the PNG spec), and JPEG (marker-segment scan for the
    * first SOFn frame header; SOF0 baseline and SOF2 progressive both
    * carry height then width big-endian after the precision byte). Returns
    * (width, height) when the payload is recognized; full pixel decode
    * still takes the stub below until codec libs exist.
    */
  private[graft] def decodeDims(bytes: Array[Byte]): Option[(Int, Int)] = {
    def be16(o: Int): Int = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    def be32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    if (bytes.length >= 10 && bytes(0) == 'P' && bytes(1) == '6') {
      val header = new String(bytes, 0, math.min(bytes.length, 64), "US-ASCII")
      val nums = "\\d+".r.findAllIn(header.drop(2)).take(2).toSeq
      if (nums.size == 2) Some((nums(0).toInt, nums(1).toInt)) else None
    } else if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M') {
      def le32(o: Int): Int =
        (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
          ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
      Some((le32(18), math.abs(le32(22)))) // height may be negative (top-down)
    } else if (bytes.length >= 24 && (bytes(0) & 0xff) == 0x89 &&
        bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') {
      // the IHDR chunk is required to be first: type at offset 12..15
      if (bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' &&
          bytes(15) == 'R') Some((be32(16), be32(20)))
      else None
    } else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8) {
      // JPEG marker walk: every segment is FF <marker> <len16 payload>;
      // stop at SOS (entropy data follows) or EOI
      var i = 2
      var out: Option[(Int, Int)] = None
      while (out.isEmpty && i + 3 < bytes.length) {
        if ((bytes(i) & 0xff) != 0xff) i += 1 // resync on stray byte
        else {
          val m = bytes(i + 1) & 0xff
          if (m == 0xff) i += 1 // fill byte before marker
          else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2 // no payload
          else if (m == 0xd9 || m == 0xda) i = bytes.length // EOI / SOS
          else {
            // SOFn = C0-CF minus DHT(C4)/JPG(C8)/DAC(CC): precision byte,
            // then lines (height), then samples-per-line (width)
            val sof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
            if (sof && i + 8 < bytes.length) out = Some((be16(i + 7), be16(i + 5)))
            else i += 2 + be16(i + 2)
          }
        }
      }
      out
    } else None
  }

  /** STUB decoder: a real build replaces this with the native decode; the
    * fake derives deterministic "dimensions" from the payload and computes
    * a real 4-bin byte histogram (honest binary-column compute).
    */
  private[streaming] def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Array[Double]) = {
    val hist = new Array[Double](4)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 6) += 1; i += 1 }
    val n = math.max(bytes.length, 1)
    (bytes.length % 640, (bytes.length * 7) % 480, bytes.length % 30 + 1,
      hist.map(_ / n))
  }

  /** Partition-wise decode + feature extraction. */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] =
    ds.mapPartitions { it =>
      // per-partition decoder init happens HERE (once), not per record
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        digest.reset()
        val hash = digest.digest(r.bytes).map(b => f"$b%02x").mkString
        val (sw, sh, frames, hist) = decodeStub(r.bytes)
        // real dimensions for recognized uncompressed formats; stub
        // dimensions otherwise (single frame for recognized stills)
        val (w, h, nf) = decodeDims(r.bytes)
          .map { case (rw, rh) => (rw, rh, 1) }
          .getOrElse((sw, sh, frames))
        MediaFeatures(r.id, r.kind, r.bytes.length, hash, w, h, nf, hist)
      }
    }

  /** Frame sampling: explode every `everyN`-th frame of a media record.
    * Stub frames are byte slices; a real build decodes keyframes.
    */
  def frameSample(ds: Dataset[MediaRecord], everyN: Int): Dataset[FrameSample] =
    ds.flatMap { r =>
      val (_, _, frames, _) = decodeStub(r.bytes)
      (0 until frames by everyN).map { f =>
        val span = math.max(r.bytes.length / frames, 1)
        val from = math.min(f * span, r.bytes.length)
        val until = math.min(from + span, r.bytes.length)
        FrameSample(r.id, f, java.util.Arrays.copyOfRange(r.bytes, from, until))
      }
    }
}
