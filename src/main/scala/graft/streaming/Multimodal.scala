package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Multimodal-column plumbing (builder-prompt first-class set): media
  * payloads travel as opaque binary columns with typed metadata; decode /
  * feature-extract / frame-sample run as partition-wise transforms so a
  * real decoder (libjpeg/ffmpeg via JNI or a Python worker) initializes
  * once per partition, not per row.
  *
  * Still images decode for REAL — pure-JVM PNG (inflate + unfilter),
  * PPM, BMP, with the JRE's ImageIO covering JPEG/GIF — via
  * [[Multimodal.pixelFeatures]]. Only video/audio decode remains a
  * deterministic STUB (no av codec libs in this container); everything
  * Spark-side is real either way: schemas, encoders, partition-wise
  * batching, the per-partition init-once pattern, and the
  * frame-explosion shape.
  */
final case class MediaRecord(
    id: Long, kind: String, bytes: Array[Byte], tags: Map[String, String])

final case class MediaFeatures(
    id: Long, kind: String, byteLen: Int, contentHash: String,
    width: Int, height: Int, nFrames: Int, byteHistogram: Array[Double])

final case class FrameSample(id: Long, frameIdx: Int, frameBytes: Array[Byte])

/** A decoded still: row-major interleaved 8-bit samples (1=gray,
  * 2=gray+alpha, 3=RGB, 4=RGBA).
  */
final case class PixelImage(width: Int, height: Int, channels: Int, pixels: Array[Byte])

/** Real pixel statistics of a decoded still: mean/stddev of Rec.601
  * luminance plus a 16-bin luminance histogram.
  */
final case class PixelFeatures(
    id: Long, width: Int, height: Int, channels: Int,
    lumMean: Double, lumStd: Double, lumHist: Array[Double])

/** 64-bit perceptual hash of a decoded still (8×8 average-pool aHash):
  * bit i set iff pool cell i's mean luminance is at or above the global
  * cell mean. Resize- and brightness-shift-tolerant by construction.
  */
final case class PHash(id: Long, width: Int, height: Int, phash: Long)

/** Real audio statistics of a decoded PCM WAV: duration, RMS energy,
  * zero-crossing rate and peak over the mono mix.
  */
final case class AudioFeatures(
    id: Long, sampleRate: Int, channels: Int, bitsPerSample: Int,
    nSamples: Int, durationSec: Double, rms: Double,
    zeroCrossRate: Double, peak: Double)

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
      // toInt on an unbounded digit run throws NumberFormatException
      // past Int range — a crafted header must fall back to None (stub
      // dims), not kill the task (round-13 kernel review)
      if (nums.size == 2 && nums.forall(n => n.length <= 9))
        Some((nums(0).toInt, nums(1).toInt))
      else None
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

  /** Video container metadata: (width, height, totalFrames, durationSec).
    * `totalFrames` is 0 when the container doesn't carry it (MP4 — a
    * frame count needs an stts sample-table walk per track).
    */
  final case class VideoInfo(width: Int, height: Int, frames: Int,
      durationSec: Double)

  /** Real video *container* probe — pure JVM header walk over the two
    * public container formats, no codec libs: ISO BMFF / MP4 (box walk to
    * `moov/mvhd` for timescale+duration and `moov/trak/tkhd` for the
    * 16.16-fixed display width/height, versions 0 and 1) and AVI (RIFF
    * `hdrl/avih`: dwMicroSecPerFrame + dwTotalFrames give the duration,
    * dwWidth/dwHeight at payload offsets 32/36, all little-endian).
    * Codec payload decode (actual frames) remains the stubbed part.
    */
  private[graft] def probeVideo(bytes: Array[Byte]): Option[VideoInfo] = try {
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def fourcc(o: Int): String = new String(bytes, o, 4, "US-ASCII")

    if (bytes.length >= 16 && fourcc(4) == "ftyp") {
      // MP4: walk top-level boxes to moov, then its children
      var durationSec = 0.0
      var w = 0
      var h = 0
      def walk(from: Long, until: Long, depth: Int): Unit = {
        var o = from
        while (o + 8 <= until) {
          val size0 = be32(o.toInt)
          val typ = fourcc(o.toInt + 4)
          // size==1 -> 64-bit largesize follows the type
          val (size1, hdr) =
            if (size0 == 1 && o + 16 <= until) (be64(o.toInt + 8), 16) else (size0, 8)
          // ISO 14496-12 §4.2: size 0 = box extends to the end of the
          // file (legal for the last box) — treat as the remaining span
          // instead of corrupt-stopping before e.g. a trailing moov
          // (round-13 kernel review)
          val size = if (size1 == 0) until - o else size1
          // compare against the remaining span, never o + size: a forged
          // 64-bit largesize can overflow the addition past Long range
          if (size < hdr || size > until - o) return // corrupt: stop cleanly
          val p = (o + hdr).toInt
          typ match {
            case "moov" | "trak" | "mdia" if depth < 4 =>
              walk(o + hdr, o + size, depth + 1)
            case "mvhd" =>
              val v = bytes(p) & 0xff
              val (ts, dur) =
                if (v == 1) (be32(p + 20), be64(p + 24))
                else (be32(p + 12), be32(p + 16))
              if (ts > 0) durationSec = dur.toDouble / ts
            case "tkhd" =>
              val v = bytes(p) & 0xff
              val base = if (v == 1) p + 88 else p + 76
              // 16.16 fixed point; keep the first track with real dims
              val tw = (be32(base) >> 16).toInt
              val th = (be32(base + 4) >> 16).toInt
              if (w == 0 && tw > 0 && th > 0) { w = tw; h = th }
            case _ => ()
          }
          o += size
        }
      }
      walk(0, bytes.length.toLong, 0)
      if (w > 0 || durationSec > 0) Some(VideoInfo(w, h, 0, durationSec)) else None
    } else if (bytes.length >= 12 && fourcc(0) == "RIFF" && fourcc(8) == "AVI ") {
      // AVI: RIFF 'AVI ' LIST 'hdrl' avih <cb> <payload>
      // Long cursors throughout: le32 sizes reach 2^32-1, and a forged
      // size cast through .toInt goes negative and walks the cursor
      // BACKWARDS — an executor-hanging infinite loop, the same corrupt-
      // length class as the round-3 decodeWav advice. Every advance is
      // checked to be strictly forward or the walk stops.
      var o = 12L
      var out: Option[VideoInfo] = None
      while (out.isEmpty && o + 8 <= bytes.length) {
        val id = fourcc(o.toInt)
        val sz = le32(o.toInt + 4)
        if (id == "LIST" && o + 12 <= bytes.length && fourcc(o.toInt + 8) == "hdrl") {
          var i = o + 12
          val end = math.min(o + 8 + sz, bytes.length.toLong)
          while (out.isEmpty && i + 8 <= end) {
            val chunkSz = le32(i.toInt + 4)
            if (fourcc(i.toInt) == "avih" && i + 8 + 40 <= end) {
              val p = i.toInt + 8
              val usPerFrame = le32(p)
              val frames = le32(p + 16)
              val vw = le32(p + 32)
              val vh = le32(p + 36)
              // u32 fields past Int range went negative through .toInt,
              // and frames*usPerFrame (two full u32s) overflowed Long —
              // refuse implausible headers instead of emitting negative
              // metadata (round-13 kernel review); duration through
              // Double cannot overflow
              if (vw < 1 || vw > Int.MaxValue || vh < 1 ||
                  vh > Int.MaxValue || frames > Int.MaxValue) return None
              out = Some(VideoInfo(vw.toInt, vh.toInt,
                frames.toInt, frames.toDouble * usPerFrame / 1e6))
            } else {
              var ni = i + 8 + chunkSz // next chunk (padded to even)
              ni += (ni & 1)
              if (ni <= i) { i = end } // corrupt size: stop cleanly
              else i = ni
            }
          }
          o = end
        } else {
          val no = o + 8 + sz + (sz % 2)
          if (no <= o) return None // corrupt size: stop cleanly
          o = no
        }
      }
      out
    } else None
  } catch { case _: Exception => None } // truncated/corrupt: drop out

  /** MPEG audio stream metadata from the frame-header walk: CBR frame
    * count, header bitrate/samplerate, frame-payload byte total and the
    * exact sample-count duration (1152 samples per MPEG-1 Layer III
    * frame).
    */
  final case class Mp3Info(frames: Int, bitrateKbps: Int, sampleRate: Int,
      frameBytes: Long, durationMs: Long)

  /** MPEG-1 Layer III *stream* probe — a real frame-header walk over the
    * public header layout (ISO/IEC 11172-3 §2.4.1.3): skips an ID3v2
    * prefix by its syncsafe length, resyncs to the first 11-bit sync
    * run, then advances frame-by-frame via
    * `len = 144 * bitrate / samplerate + padding`, validating every
    * header (MPEG-1, Layer III, legal bitrate/samplerate indices).
    * Payload decode (Huffman spectra) stays permanently out of scope
    * like the other perceptual codecs — this walk is the metadata +
    * integrity surface (frame count, CBR check, exact duration) a data
    * engine needs.
    */
  private[graft] def probeMp3(bytes: Array[Byte]): Option[Mp3Info] = try {
    val bitrates = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
      192, 224, 256, 320)
    val rates = Array(44100, 48000, 32000)
    var pos = 0
    // ID3v2 prefix: "ID3" + ver(2) + flags + 4-byte syncsafe body length
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val sz = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      pos = 10 + sz
    }
    // resync: scan for the 11-bit sync word
    while (pos + 1 < bytes.length &&
      !((bytes(pos) & 0xff) == 0xff && (bytes(pos + 1) & 0xe0) == 0xe0))
      pos += 1
    var frames = 0
    var kbps = -1
    var rate = -1
    var frameBytes = 0L
    var ok = true
    while (ok && pos + 4 <= bytes.length &&
        (bytes(pos) & 0xff) == 0xff && (bytes(pos + 1) & 0xe0) == 0xe0) {
      val b1 = bytes(pos + 1) & 0xff
      val b2 = bytes(pos + 2) & 0xff
      val version = (b1 >> 3) & 3 // 3 = MPEG-1
      val layer = (b1 >> 1) & 3   // 1 = Layer III
      val bri = (b2 >> 4) & 15
      val sri = (b2 >> 2) & 3
      val padding = (b2 >> 1) & 1
      if (version != 3 || layer != 1 || bri == 0 || bri == 15 || sri == 3)
        ok = false
      else {
        val br = bitrates(bri); val sr = rates(sri)
        if (kbps == -1) { kbps = br; rate = sr }
        else if (kbps != br || rate != sr) ok = false // VBR: out of scope
        if (ok) {
          val len = 144 * br * 1000 / sr + padding
          if (pos + len > bytes.length) ok = false // truncated final frame
          else { frames += 1; frameBytes += len; pos += len }
        }
      }
    }
    if (frames > 0)
      Some(Mp3Info(frames, kbps, rate, frameBytes,
        frames.toLong * 1152L * 1000L / rate))
    else None
  } catch { case _: Exception => None }

  /** Real pixel decode, pure JVM: PNG (zlib inflate + per-scanline
    * None/Sub/Up/Average/Paeth unfilter, 8-bit depth, color types
    * 0/2/3/4/6, non-interlaced — the overwhelmingly common profile), PPM
    * P6 and 24-bit uncompressed BMP. Anything else falls back to the
    * JDK's own ImageIO (JPEG/GIF ship with the JRE) in
    * [[decodePixelsAny]]; only video/audio remain stubbed.
    */
  private[graft] def decodePixels(bytes: Array[Byte]): Option[PixelImage] = try {
    if (bytes.length >= 10 && bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 24 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P')
      decodePng(bytes)
    else if (bytes.length >= 13 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')
      decodeGif(bytes)
    else if (bytes.length >= 8 &&
      ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 && bytes(3) == 0) ||
        (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 42)))
      decodeTiff(bytes)
    else None
  } catch {
    // truncated/corrupt payloads must DROP, not kill the task — the
    // documented semantics of pixelFeatures ("undecodable records drop out")
    case _: Exception => None
  }

  /** [[decodePixels]] plus the ImageIO fallback (headless JRE decoders,
    * covers baseline+progressive JPEG). RGB output from the fallback.
    */
  private[graft] def decodePixelsAny(bytes: Array[Byte]): Option[PixelImage] =
    decodePixels(bytes).orElse {
      try {
        System.setProperty("java.awt.headless", "true")
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
          .map { img =>
            val (w, h) = (img.getWidth, img.getHeight)
            val out = new Array[Byte](w * h * 3)
            var i = 0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                out(i) = ((rgb >> 16) & 0xff).toByte
                out(i + 1) = ((rgb >> 8) & 0xff).toByte
                out(i + 2) = (rgb & 0xff).toByte
                i += 3; x += 1
              }
              y += 1
            }
            PixelImage(w, h, 3, out)
          }
      } catch { case _: Throwable => None }
    }

  private def decodePpm(bytes: Array[Byte]): Option[PixelImage] = {
    // header: "P6" <ws> width <ws> height <ws> maxval <single ws> raw RGB;
    // '#' comments run to end of line
    var pos = 2
    def nextInt(): Int = {
      while (pos < bytes.length &&
          (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else pos += 1
      }
      val start = pos
      while (pos < bytes.length && bytes(pos).toChar.isDigit) pos += 1
      new String(bytes, start, pos - start, "US-ASCII").toInt
    }
    try {
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      pos += 1 // the single whitespace after maxval
      // same lying-dims guards as PNG/GIF/TIFF (round-13 review): a
      // crafted header whose w*h*3 wraps Int passed the length check and
      // returned a PixelImage smaller than its claimed dims, crashing
      // resizeLuma inside mapPartitions; zero dims yielded NaN features
      // and a degenerate all-ones phash
      if (w <= 0 || h <= 0 || w.toLong * h * 3 > Int.MaxValue) None
      else if (maxval != 255 || bytes.length < pos.toLong + w * h * 3) None
      else Some(PixelImage(w, h, 3, java.util.Arrays.copyOfRange(bytes, pos, pos + w * h * 3)))
    } catch { case _: Exception => None }
  }

  private def decodeBmp(bytes: Array[Byte]): Option[PixelImage] = {
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val dataOffset = le32(10)
    val w = le32(18)
    val hRaw = le32(22)
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    if (le16(28) != 24 || le32(30) != 0) return None // 24bpp uncompressed only
    // zero/negative/overflowing dims: refuse like the other stills
    // decoders (w*3 alone can wrap Int when h = 1; round-13 review)
    if (w <= 0 || h <= 0 || dataOffset < 0 ||
        w.toLong * h * 3 > Int.MaxValue - 4) return None // -4: row padding
    val rowBytes = ((w.toLong * 3 + 3) / 4 * 4).toInt // rows pad to 4 bytes
    if (bytes.length < dataOffset.toLong + rowBytes.toLong * h) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOffset + (if (topDown) y else h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3 // BGR on disk
        val d = (y * w + x) * 3
        out(d) = bytes(s + 2); out(d + 1) = bytes(s + 1); out(d + 2) = bytes(s)
        x += 1
      }
      y += 1
    }
    Some(PixelImage(w, h, 3, out))
  }

  private def decodePng(bytes: Array[Byte]): Option[PixelImage] = {
    def be32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    var width, height, bitDepth, colorType, interlace = 0
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      val len = be32(pos)
      // a negative/oversized length would stall or escape the walk —
      // corrupt chunk means undecodable, not an exception or a hang
      if (len < 0 || pos.toLong + 8 + len + 4 > bytes.length) return None
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      val data = pos + 8
      ctype match {
        case "IHDR" if len >= 13 =>
          width = be32(data); height = be32(data + 4)
          bitDepth = bytes(data + 8) & 0xff; colorType = bytes(data + 9) & 0xff
          interlace = bytes(data + 12) & 0xff
        case "PLTE" => palette = java.util.Arrays.copyOfRange(bytes, data, data + len)
        case "IDAT" => idat.write(bytes, data, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      pos = data + len + 4 // skip crc
    }
    if (width <= 0 || height <= 0 || bitDepth != 8 || interlace != 0) return None
    if (width.toLong * height * 4 > Int.MaxValue) return None // lying IHDR dims
    val chRaw = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    // zlib inflate of the concatenated IDAT stream
    val rowBytes = width * chRaw
    val raw = new Array[Byte]((rowBytes + 1) * height)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    // end() in finally: the truncated-stream early return (and a
    // DataFormatException from malformed IDAT) would otherwise retain
    // native zlib memory until finalization — exactly under the
    // corrupt-input load this decoder is documented to tolerate
    try {
      while (!inflater.finished() && off < raw.length) {
        val n = inflater.inflate(raw, off, raw.length - off)
        // n == 0 without finished() means the stream cannot progress:
        // truncated input (needsInput) OR an FDICT preset dictionary
        // (needsDictionary — forbidden by PNG §2.2 but expressible in a
        // zlib header). Only the first case was handled; the dictionary
        // case returned 0 with needsInput() false and spun this loop
        // forever, hanging the executor task (round-13 kernel review)
        if (n == 0) return None
        off += n
      }
    } finally inflater.end()
    if (off < raw.length) return None
    // per-scanline unfilter (PNG spec 9.2): bpp is the full-pixel stride
    val out = new Array[Byte](rowBytes * height)
    val bpp = chRaw
    var y = 0
    while (y < height) {
      val ft = raw(y * (rowBytes + 1)) & 0xff
      val src = y * (rowBytes + 1) + 1
      val dst = y * rowBytes
      var i = 0
      while (i < rowBytes) {
        val x = raw(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = if (y > 0) out(dst - rowBytes + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp) out(dst - rowBytes + i - bpp) & 0xff else 0
        val v = ft match {
          case 0 => x
          case 1 => x + left
          case 2 => x + up
          case 3 => x + (left + up) / 2
          case 4 => // Paeth predictor
            val p = left + up - ul
            val (pa, pb, pc) = (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
            x + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
          case _ => return None
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    if (colorType == 3) { // palette indices expand to RGB
      if (palette == null) return None
      val rgb = new Array[Byte](width * height * 3)
      var i = 0
      while (i < width * height) {
        val p = (out(i) & 0xff) * 3
        rgb(i * 3) = palette(p); rgb(i * 3 + 1) = palette(p + 1)
        rgb(i * 3 + 2) = palette(p + 2)
        i += 1
      }
      Some(PixelImage(width, height, 3, rgb))
    } else Some(PixelImage(width, height, chRaw, out))
  }

  /** GIF87a/89a decode (CompuServe spec + RFC-adjacent W3C note — public):
    * logical-screen walk, global/local color table, extension-block skip,
    * and a full variable-width LSB-first LZW decompressor including the
    * KwKwK self-reference case and clear-code table resets, plus the
    * four-pass interlace row order. Malformed streams return None, same
    * contract as the other stills decoders. Reference behavior mirrored
    * from the reference engine's opaque-binary ingest only — the decode
    * itself is spec-derived (reference keeps media as pass-through blobs).
    */
  private[graft] def decodeGif(bytes: Array[Byte]): Option[PixelImage] =
    gifFrames(bytes).headOption

  /** All frames of a (possibly animated) GIF, composited in order onto
    * the logical screen with do-not-dispose semantics — each image
    * block (any sub-rectangle, local colour table, interlace) draws
    * over the previous canvas state and a snapshot is emitted per
    * block. Malformed streams yield the frames decoded so far (empty
    * for a broken header), never throw.
    */
  private[graft] def gifFrames(bytes: Array[Byte]): IndexedSeq[PixelImage] = try {
    val none = IndexedSeq.empty[PixelImage]
    if (bytes.length < 13) return none
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return none
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val sw = le16(6); val sh = le16(8)
    if (sw <= 0 || sh <= 0 || sw.toLong * sh * 3 > Int.MaxValue) return none
    val gctFlag = (bytes(10) & 0x80) != 0
    val gctSize = 2 << (bytes(10) & 0x07)
    var pos = 13
    var gct: Array[Byte] = null
    if (gctFlag) {
      if (pos + gctSize * 3 > bytes.length) return none
      gct = java.util.Arrays.copyOfRange(bytes, pos, pos + gctSize * 3)
      pos += gctSize * 3
    }
    val canvas = new Array[Byte](sw * sh * 3)
    val frames = IndexedSeq.newBuilder[PixelImage]
    var stop = false
    // transparent palette index from the Graphic Control Extension that
    // precedes a rendering block; -1 = opaque (GCE scope is ONE block)
    var transIdx = -1
    while (!stop && pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x21 => // extension: read GCE transparency, skip the rest
          // GIF89a §23: 21 F9 04 <flags> <delay16> <transIdx> 00; flag
          // bit 0 = transparent-colour flag. Pre-fix ALL extensions were
          // skipped, so transparent pixels in delta frames (the canonical
          // animated-GIF encoding) were painted with their palette colour
          // instead of showing the prior canvas through (round-13 review)
          if (pos + 7 < bytes.length && (bytes(pos + 1) & 0xff) == 0xf9 &&
              (bytes(pos + 2) & 0xff) == 4)
            transIdx = if ((bytes(pos + 3) & 1) != 0) bytes(pos + 6) & 0xff
                       else -1
          pos += 2
          while (pos < bytes.length && bytes(pos) != 0) pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x3b => stop = true // trailer
        case 0x2c =>
          // stream truncated mid-descriptor: keep the frames decoded so
          // far (the documented contract) instead of letting the read
          // throw into the outer catch and discard them (round-8 advice)
          if (pos + 10 > bytes.length) return frames.result()
          val left = le16(pos + 1); val top = le16(pos + 3)
          val w = le16(pos + 5); val h = le16(pos + 7)
          val iflags = bytes(pos + 9) & 0xff
          pos += 10
          var pal = gct
          if ((iflags & 0x80) != 0) { // local colour table overrides
            val lctSize = 2 << (iflags & 0x07)
            if (pos + lctSize * 3 > bytes.length) return frames.result()
            pal = java.util.Arrays.copyOfRange(bytes, pos, pos + lctSize * 3)
            pos += lctSize * 3
          }
          if (pal == null || w <= 0 || h <= 0 ||
            left + w > sw || top + h > sh) return frames.result()
          if (pos >= bytes.length) return frames.result() // truncated at min-code
          val minCode = bytes(pos) & 0xff
          pos += 1
          // GIF89a valid LZW minimum code size is 2-8 (root codes map
          // palette entries, max table 256): 9-11 'decoded' to a
          // plausible-looking frame every conforming decoder rejects
          // (round-13 kernel review)
          if (minCode < 2 || minCode > 8) return frames.result()
          // concatenate the data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (pos < bytes.length && bytes(pos) != 0) {
            val n = bytes(pos) & 0xff
            if (pos + 1 + n > bytes.length) return frames.result()
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          pos += 1 // data terminator
          val out = lzwDecode(data.toByteArray, minCode, w * h)
            .getOrElse(return frames.result())
          // interlaced streams store rows in four passes (spec app. E):
          // rows 0,8,16…, then 4,12…, then 2,6…, then 1,3,5…
          val rows =
            if ((iflags & 0x40) == 0) out
            else {
              val deinter = new Array[Byte](out.length)
              var src = 0
              for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
                var y = start
                while (y < h) {
                  System.arraycopy(out, src * w, deinter, y * w, w)
                  src += 1; y += step
                }
              }
              deinter
            }
          val palN = pal.length / 3
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val idx = rows(y * w + x) & 0xff
              // transparent index: prior canvas shows through (GIF89a
              // §23 transparency over do-not-dispose compositing)
              if (idx != transIdx) {
                val p = math.min(idx, palN - 1) * 3
                val d = ((top + y) * sw + (left + x)) * 3
                canvas(d) = pal(p); canvas(d + 1) = pal(p + 1); canvas(d + 2) = pal(p + 2)
              }
              x += 1
            }
            y += 1
          }
          transIdx = -1 // GCE applies to exactly one rendering block
          frames += PixelImage(sw, sh, 3, canvas.clone())
        case _ => stop = true // unknown block: stop cleanly
      }
    }
    frames.result()
  } catch { case _: Exception => IndexedSeq.empty }

  /** Variable-width LSB-first GIF-LZW decompress of a concatenated data
    * stream to exactly `outLen` palette indices (KwKwK, width growth,
    * clear resets). None on malformed/truncated input.
    */
  private def lzwDecode(in: Array[Byte], minCode: Int, outLen: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4097)
    var next = eoi + 1
    var codeSize = minCode + 1
    var bitBuf = 0; var bitCnt = 0; var ip = 0
    var prev = -1
    val out = new Array[Byte](outLen)
    var op = 0
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }
    var done = false
    while (!done && op < out.length) {
      while (bitCnt < codeSize && ip < in.length) {
        bitBuf |= (in(ip) & 0xff) << bitCnt; bitCnt += 8; ip += 1
      }
      if (bitCnt < codeSize) done = true
      else {
        val code = bitBuf & ((1 << codeSize) - 1)
        bitBuf >>>= codeSize; bitCnt -= codeSize
        if (code == clear) {
          next = eoi + 1; codeSize = minCode + 1; prev = -1
        } else if (code == eoi) done = true
        else if (prev < 0) {
          // first code after a clear must be a root symbol
          if (code >= clear) return None
          out(op) = suffix(code); op += 1; prev = code
        } else {
          if (code > next) return None
          // expand the chain of (code or, for KwKwK, prev) onto the stack
          var sp = 0
          var cur = if (code == next) prev else code
          while (cur >= 0) { stack(sp) = suffix(cur); sp += 1; cur = prefix(cur) }
          val first = stack(sp - 1) // the decoded string's head symbol
          var j = sp - 1
          while (j >= 0 && op < out.length) { out(op) = stack(j); op += 1; j -= 1 }
          // KwKwK (code == next): string is prev-string + its own head
          if (code == next && op < out.length) { out(op) = first; op += 1 }
          if (next < 4096) {
            prefix(next) = prev; suffix(next) = first
            next += 1
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        }
      }
    }
    if (op < out.length) None else Some(out)
  }

  /** Baseline TIFF 6.0 decode (public Adobe spec): classic header in
    * either byte order (II/MM), IFD walk with inline-or-offset values
    * (SHORT/LONG), uncompressed (Compression=1) chunky
    * (PlanarConfiguration=1) rasters, 8-bit grayscale (Photometric 0/1)
    * or RGB (Photometric 2, 3+ samples — extra samples dropped), any
    * strip layout. Malformed streams return None, never throw.
    */
  private[graft] def decodeTiff(bytes: Array[Byte]): Option[PixelImage] = try {
    if (bytes.length < 8) return None
    val le =
      if (bytes(0) == 'I' && bytes(1) == 'I') true
      else if (bytes(0) == 'M' && bytes(1) == 'M') false
      else return None
    def u16(o: Int): Int =
      if (le) (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
      else ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    def u32(o: Int): Long =
      if (le) (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      else ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    if (u16(2) != 42) return None
    val ifd = u32(4).toInt
    if (ifd < 8 || ifd + 2 > bytes.length) return None
    val n = u16(ifd)
    if (ifd + 2 + n * 12 + 4 > bytes.length) return None
    // tag -> list of numeric values (SHORT=3 or LONG=4 only)
    val tags = scala.collection.mutable.Map.empty[Int, IndexedSeq[Long]]
    for (i <- 0 until n) {
      val e = ifd + 2 + i * 12
      val tag = u16(e); val typ = u16(e + 2); val cnt = u32(e + 4).toInt
      val elemSize = typ match { case 3 => 2; case 4 => 4; case _ => 0 }
      if (elemSize > 0 && cnt > 0 && cnt <= (1 << 20)) {
        val total = elemSize * cnt
        val base = if (total <= 4) e + 8 else u32(e + 8).toInt
        if (base >= 0 && base + total <= bytes.length)
          tags(tag) = (0 until cnt).map(j =>
            if (typ == 3) u16(base + j * 2).toLong else u32(base + j * 4))
      }
    }
    def one(tag: Int, dflt: Long = -1L): Long =
      tags.get(tag).flatMap(_.headOption).getOrElse(dflt)
    val w = one(256).toInt; val h = one(257).toInt
    if (w <= 0 || h <= 0 || w.toLong * h * 3 > Int.MaxValue) return None
    if (one(259, 1L) != 1L) return None // uncompressed only
    if (one(284, 1L) != 1L) return None // chunky only
    val photo = one(262).toInt
    val spp = one(277, 1L).toInt
    if (tags.get(258).exists(_.exists(_ != 8L))) return None // 8-bit only
    val offs = tags.getOrElse(273, return None)
    val cnts = tags.getOrElse(279,
      IndexedSeq(w.toLong * h * spp)) // single-strip fallback
    if (offs.size != cnts.size) return None
    val raster = new Array[Byte](w * h * spp)
    var op = 0
    for (k <- offs.indices) {
      val o = offs(k).toInt; val c = cnts(k).toInt
      if (o < 0 || c < 0 || o + c > bytes.length || op + c > raster.length) return None
      System.arraycopy(bytes, o, raster, op, c)
      op += c
    }
    if (op < raster.length) return None
    photo match {
      case 2 if spp >= 3 =>
        if (spp == 3) Some(PixelImage(w, h, 3, raster))
        else { // drop extra samples (e.g. alpha)
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          while (i < w * h) {
            rgb(i * 3) = raster(i * spp); rgb(i * 3 + 1) = raster(i * spp + 1)
            rgb(i * 3 + 2) = raster(i * spp + 2)
            i += 1
          }
          Some(PixelImage(w, h, 3, rgb))
        }
      case 1 if spp == 1 => Some(PixelImage(w, h, 1, raster))
      case 0 if spp == 1 => // WhiteIsZero: invert
        val inv = raster.map(b => (255 - (b & 0xff)).toByte)
        Some(PixelImage(w, h, 1, inv))
      case _ => None
    }
  } catch { case _: Exception => None }

  /** Minimal classic little-endian baseline TIFF encode (RGB chunky,
    * one strip) — exists so mm_tiff and the specs can round-trip
    * [[decodeTiff]] against independently produced streams (the JDK's
    * ImageIO TIFF plugin cross-check in TiffCodecSpec).
    */
  private[graft] def encodeTiff(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, "raster must be w*h*3")
    val out = java.nio.ByteBuffer.allocate(128 + rgb.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(8)
    val nEntries = 9
    val bpsOff = 8 + 2 + nEntries * 12 + 4 // BitsPerSample triple after IFD
    val dataOff = bpsOff + 6
    out.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, cnt: Int, v: Int): Unit = {
      out.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt)
      if (typ == 3 && cnt == 1) { out.putShort(v.toShort); out.putShort(0) }
      else out.putInt(v)
    }
    entry(256, 4, 1, w); entry(257, 4, 1, h)
    entry(258, 3, 3, bpsOff) // -> [8,8,8]
    entry(259, 3, 1, 1); entry(262, 3, 1, 2)
    entry(273, 4, 1, dataOff); entry(277, 3, 1, 3)
    entry(278, 4, 1, h); entry(279, 4, 1, rgb.length)
    out.putInt(0) // no next IFD
    out.putShort(8).putShort(8).putShort(8)
    out.put(rgb)
    java.util.Arrays.copyOf(out.array(), out.position())
  }

  /** GIF87a encode of a palette-indexed image — real variable-width LZW
    * with clear/EOI codes, table growth to 12 bits with mid-stream clear,
    * LSB-first packing and 255-byte sub-blocks. `palette(c)` is 0xRRGGBB.
    * Exists so the mm_gif board row and the specs can round-trip the
    * decoder against independently produced streams (ImageIO cross-check
    * in MultimodalSpec).
    */
  private[graft] def encodeGif(w: Int, h: Int, indices: Array[Byte],
      palette: Array[Int]): Array[Byte] =
    encodeGifStream(w, h, Seq(indices), palette, animated = false)

  /** Animated GIF89a: one full-frame image block per element of
    * `frames`, each preceded by a graphic-control extension with a
    * 4/100 s delay — the real multi-block container shape `gifFrames`
    * walks. Same shared LZW core as the stills encoder.
    */
  private[graft] def encodeGifAnim(w: Int, h: Int, frames: Seq[Array[Byte]],
      palette: Array[Int]): Array[Byte] =
    encodeGifStream(w, h, frames, palette, animated = true)

  private def encodeGifStream(w: Int, h: Int, frames: Seq[Array[Byte]],
      palette: Array[Int], animated: Boolean): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == w * h),
      "each index buffer must be w*h")
    val palBits = math.max(1,
      32 - Integer.numberOfLeadingZeros(math.max(2, palette.length) - 1))
    val palN = 1 << palBits
    val out = new java.io.ByteArrayOutputStream()
    out.write((if (animated) "GIF89a" else "GIF87a").getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0x80 | 0x70 | (palBits - 1)) // GCT present, 8-bit colour res
    out.write(0); out.write(0)
    var c = 0
    while (c < palN) {
      val rgb = if (c < palette.length) palette(c) else 0
      out.write((rgb >> 16) & 0xff); out.write((rgb >> 8) & 0xff); out.write(rgb & 0xff)
      c += 1
    }
    val minCode = math.max(2, palBits)
    frames.foreach { indices =>
      if (animated) { // graphic control extension: 4/100 s, no disposal
        out.write(0x21); out.write(0xf9); out.write(4)
        out.write(0); le16(4); out.write(0); out.write(0)
      }
      out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0)
      out.write(minCode)
      val data = lzwEncode(indices, minCode)
      var off = 0
      while (off < data.length) {
        val n = math.min(255, data.length - off)
        out.write(n); out.write(data, off, n)
        off += n
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** GIF-LZW compress: real variable-width codes with clear/EOI, table
    * growth to 12 bits and a mid-stream clear when the dictionary fills.
    */
  private def lzwEncode(indices: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    // boxed keys on purpose: a primitive-typed java.util.HashMap unboxes a
    // missing key's null to 0, which reads as a (wrong) dictionary hit
    val dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    var codeSize = minCode + 1
    val body = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += codeSize
      while (bitCnt >= 8) { body.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8 }
    }
    emit(clear)
    var prev = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      val key = Integer.valueOf((prev << 12) | k)
      val ext = dict.get(key)
      if (ext != null) prev = ext.intValue()
      else {
        emit(prev)
        if (next < 4096) {
          dict.put(key, Integer.valueOf(next))
          next += 1
          // standard (late-change) GIF width growth. The +1 offsets the
          // encoder/decoder phase difference: the encoder ADDS an entry
          // before its next emit, the decoder adds it only after reading
          // that code — so the encoder must switch width one add later
          // to stay in sync (pinned against ImageIO in GifCodecSpec).
          if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
        } else {
          emit(clear); dict.clear(); next = eoi + 1; codeSize = minCode + 1
        }
        prev = k
      }
      i += 1
    }
    emit(prev); emit(eoi)
    if (bitCnt > 0) body.write((bitBuf & 0xff).toInt)
    body.toByteArray
  }

  /** Partition-wise REAL pixel feature extraction over the decodable
    * stills (undecodable records drop out); Rec.601 luminance mean/std
    * and a 16-bin histogram — the feature-extract stage of an image
    * training pipeline, init-once per partition like [[decodeFeatures]].
    */
  def pixelFeatures(ds: Dataset[MediaRecord]): Dataset[PixelFeatures] = {
    implicit val enc: Encoder[PixelFeatures] = Encoders.product[PixelFeatures]
    ds.mapPartitions { it =>
      it.flatMap { r =>
        decodePixelsAny(r.bytes).map { img =>
          val n = img.width * img.height
          val hist = new Array[Double](16)
          var sum = 0.0
          var sumSq = 0.0
          var i = 0
          while (i < n) {
            val o = i * img.channels
            val lum = img.channels match {
              case 1 | 2 => (img.pixels(o) & 0xff).toDouble
              case _ => 0.299 * (img.pixels(o) & 0xff) +
                0.587 * (img.pixels(o + 1) & 0xff) + 0.114 * (img.pixels(o + 2) & 0xff)
            }
            sum += lum; sumSq += lum * lum
            hist(math.min(15, (lum / 16).toInt)) += 1
            i += 1
          }
          val mean = sum / n
          val variance = math.max(0.0, sumSq / n - mean * mean)
          PixelFeatures(r.id, img.width, img.height, img.channels,
            mean, math.sqrt(variance), hist.map(_ / n))
        }
      }
    }
  }

  /** Box-filter luminance resize of a decoded still to a `gw`×`gh` grid
    * (row-major means) — the resize stage of an image pipeline, shared by
    * the perceptual hash. Each source pixel lands in exactly one cell, so
    * the pass is a single scan regardless of scale factor.
    */
  def resizeLuma(img: PixelImage, gw: Int, gh: Int): Array[Double] = {
    val cells = new Array[Double](gw * gh)
    val counts = new Array[Int](gw * gh)
    var y = 0
    while (y < img.height) {
      val cy = math.min(gh - 1, y * gh / img.height)
      var x = 0
      while (x < img.width) {
        val cx = math.min(gw - 1, x * gw / img.width)
        val o = (y * img.width + x) * img.channels
        val lum = img.channels match {
          case 1 | 2 => (img.pixels(o) & 0xff).toDouble
          case _ => 0.299 * (img.pixels(o) & 0xff) +
            0.587 * (img.pixels(o + 1) & 0xff) + 0.114 * (img.pixels(o + 2) & 0xff)
        }
        val c = cy * gw + cx
        cells(c) += lum; counts(c) += 1
        x += 1
      }
      y += 1
    }
    var i = 0
    while (i < cells.length) { if (counts(i) > 0) cells(i) /= counts(i); i += 1 }
    cells
  }

  private[graft] def pool8(img: PixelImage): Array[Double] = resizeLuma(img, 8, 8)

  /** Perceptual hashes over the decodable stills — the image analog of
    * `SimHash64` for text: near-duplicate images (recompressions,
    * resizes, small edits) land within a few Hamming bits, so the
    * downstream pairing reuses the same hamming-banded join as
    * `dd_simhash_pairs`. Average-pool aHash (public technique): pool to
    * 8×8 luma, threshold each cell at the mean of the 64 cells.
    */
  def perceptualHashes(ds: Dataset[MediaRecord]): Dataset[PHash] = {
    implicit val enc: Encoder[PHash] = Encoders.product[PHash]
    ds.mapPartitions { it =>
      it.flatMap { r =>
        decodePixelsAny(r.bytes).map { img =>
          val cells = pool8(img)
          val mean = cells.sum / 64
          var h = 0L
          var i = 0
          while (i < 64) { if (cells(i) >= mean) h |= (1L << i); i += 1 }
          PHash(r.id, img.width, img.height, h)
        }
      }
    }
  }

  /** Real WAV decode, pure JVM (RIFF/WAVE chunk walk, fmt + data):
    * PCM 8-bit unsigned / 16 / 24 / 32-bit signed little-endian (tag 1),
    * IEEE float32/float64 (tag 3), G.711 A-law (tag 6) and mu-law (tag
    * 7, both from the public CCITT tables), IMA/DVI ADPCM (tag 0x11 —
    * the block-compressed 4-bit codec from the public IMA spec),
    * Microsoft ADPCM (tag 0x02, predictor-coefficient blocks), and
    * WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE, dispatched on the SubFormat
    * GUID's format code) — any channel count. Returns (sampleRate,
    * channels, bitsPerSample, mono mix in [-1, 1]).
    *
    * Perceptual/entropy-coded codecs (MP3, AAC; video: H.264-class) are
    * PERMANENTLY out of scope: no codec libraries exist in this
    * dependency set and reimplementing them is not a data-engine
    * concern. Containers around them still parse (AVI/RIFF walk, frame
    * index, codec fourcc surface as metadata) so a cluster with codec
    * libs can slot a real decoder into the same mapPartitions seam.
    */
  private[graft] def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Double])] = {
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var fmtTag = 0
    var channels, sampleRate, bps, blockAlign = 0
    var fmtPos = -1
    var fmtLen = 0
    var data: (Int, Int) = null // (offset, length)
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val id = tag(pos)
      val len = le32(pos + 4)
      // a negative chunk length (len = -8 makes the advance zero) would
      // hang the executor task forever — corrupt RIFF means undecodable
      if (len < 0) return None
      if (id == "fmt " && len >= 16 && pos + 24 <= bytes.length) {
        fmtPos = pos
        fmtLen = len
        fmtTag = le16(pos + 8)
        channels = le16(pos + 10)
        sampleRate = le32(pos + 12)
        blockAlign = le16(pos + 20)
        bps = le16(pos + 22)
      } else if (id == "data")
        data = (pos + 8, math.min(len, bytes.length - pos - 8))
      // chunks pad to even length; a truncated final chunk ends the walk
      val next = pos.toLong + 8 + len + (len & 1)
      pos = if (next > bytes.length) bytes.length else next.toInt
    }
    if (data == null || channels <= 0) return None
    // WAVE_FORMAT_EXTENSIBLE: the real format code is the first two
    // bytes of the SubFormat GUID (fmt chunk offset 24)
    if (fmtTag == 0xfffe) {
      if (fmtPos < 0 || fmtLen < 40 || fmtPos + 8 + 26 > bytes.length) return None
      fmtTag = le16(fmtPos + 8 + 24)
    }
    if (fmtTag == 0x11)
      return decodeImaAdpcm(bytes, data._1, data._2, channels, blockAlign)
        .map(mono => (sampleRate, channels, 4, mono))
    if (fmtTag == 0x02)
      return decodeMsAdpcm(bytes, data._1, data._2, channels, blockAlign)
        .map(mono => (sampleRate, channels, 4, mono))
    def le64(o: Int): Long =
      (le32(o) & 0xffffffffL) | ((le32(o + 4) & 0xffffffffL) << 32)
    val ok = fmtTag match {
      case 1 => bps == 8 || bps == 16 || bps == 24 || bps == 32
      case 3 => bps == 32 || bps == 64
      case 6 | 7 => bps == 8
      case _ => false
    }
    if (!ok) return None
    @inline def sample(o: Int): Double = fmtTag match {
      case 1 => bps match {
        case 8  => ((bytes(o) & 0xff) - 128) / 128.0
        case 16 => le16(o).toShort / 32768.0
        // bytes(o+2) is a signed Byte: its <<16 carries the sign
        case 24 => ((bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
          (bytes(o + 2) << 16)) / 8388608.0
        case _  => le32(o) / 2147483648.0
      }
      case 3 =>
        if (bps == 32) java.lang.Float.intBitsToFloat(le32(o)).toDouble
        else java.lang.Double.longBitsToDouble(le64(o))
      case 6 => alaw2linear(bytes(o)) / 32768.0
      case _ => ulaw2linear(bytes(o)) / 32768.0
    }
    val bytesPerFrame = channels * bps / 8
    val n = data._2 / bytesPerFrame
    val mono = new Array[Double](n)
    var i = 0
    while (i < n) {
      var sum = 0.0
      var c = 0
      while (c < channels) {
        sum += sample(data._1 + i * bytesPerFrame + c * bps / 8)
        c += 1
      }
      mono(i) = sum / channels
      i += 1
    }
    Some((sampleRate, channels, bps, mono))
  }

  /** G.711 mu-law expansion (public CCITT spec / Sun g711.c, public
    * domain): invert, rebuild the biased mantissa, shift by the segment.
    * Output is 16-bit linear range (max |32124|).
    */
  @inline private def ulaw2linear(b: Byte): Int = {
    val u = ~b & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law expansion (same public source): XOR 0x55, segment 0/1
    * special-cased, higher segments shift. Max |32256| (quant 0xF in
    * segment 7: (240+264)<<6 — the old doc said 32640, which is µ-law's
    * ballpark, not this table's; round-13 kernel review).
    */
  @inline private def alaw2linear(b: Byte): Int = {
    val a = (b ^ 0x55) & 0xff
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  // IMA ADPCM quantizer tables (public IMA/DVI specification)
  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767)

  private val ImaIndex: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA nibble step: returns (newPredictor, newIndex). The exact
    * shift-based reconstruction from the spec — diff = step/8 + the
    * selected step fractions, clamped predictor, clamped index.
    */
  @inline private def imaStepNibble(n: Int, pred: Int, idx: Int): (Int, Int) = {
    val step = ImaStep(idx)
    var diff = step >> 3
    if ((n & 4) != 0) diff += step
    if ((n & 2) != 0) diff += step >> 1
    if ((n & 1) != 0) diff += step >> 2
    val p0 = if ((n & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, idx + ImaIndex(n & 7)))
    (p, i)
  }

  /** IMA ADPCM block-stream decode: each `blockAlign` block opens with a
    * 4-byte per-channel header (int16 predictor = first sample, step
    * index, reserved) followed by 4-bit nibbles in 4-byte per-channel
    * groups (low nibble first, channels interleaved by group). A
    * truncated final block decodes as far as its bytes go. Returns the
    * mono mix in [-1, 1].
    */
  private def decodeImaAdpcm(bytes: Array[Byte], off: Int, len: Int,
      channels: Int, blockAlign: Int): Option[Array[Double]] = {
    if (blockAlign < 4 * channels) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    var block = off
    val end = off + len
    while (block + 4 * channels <= end) {
      val blockEnd = math.min(block + blockAlign, end)
      var c = 0
      var sum = 0.0
      while (c < channels) {
        val h = block + c * 4
        pred(c) = ((bytes(h) & 0xff) | ((bytes(h + 1) & 0xff) << 8)).toShort.toInt
        idx(c) = math.max(0, math.min(88, bytes(h + 2) & 0xff))
        sum += pred(c) / 32768.0
        c += 1
      }
      out += sum / channels // header predictor IS output sample 0
      // nibble groups: 4 bytes (8 samples) per channel, channels rotate
      var g = block + 4 * channels
      var done = false
      while (!done && g + 4 * channels <= blockEnd) {
        var s = 0
        while (s < 8) { // 8 samples per group
          var sm = 0.0
          var c2 = 0
          while (c2 < channels) {
            val b = bytes(g + c2 * 4 + (s >> 1)) & 0xff
            val nib = if ((s & 1) == 0) b & 0xf else b >> 4
            val (p, i2) = imaStepNibble(nib, pred(c2), idx(c2))
            pred(c2) = p; idx(c2) = i2
            sm += p / 32768.0
            c2 += 1
          }
          out += sm / channels
          s += 1
        }
        g += 4 * channels
        if (g >= blockEnd) done = true
      }
      block += blockAlign
    }
    if (out.isEmpty) None else Some(out.toArray)
  }

  // MS ADPCM tables (public Microsoft WAVE spec)
  private val MsAdaptTable: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230,
    230, 230)
  private val MsCoeff1: Array[Int] = Array(256, 512, 0, 192, 240, 460, 392)
  private val MsCoeff2: Array[Int] = Array(0, -256, 0, 64, 0, -208, -232)

  /** Microsoft ADPCM (format tag 0x02, public spec) block decode: each
    * block opens per channel with a predictor-coefficient index, initial
    * delta, and the block's first two PCM samples (emitted verbatim),
    * then packs one 4-bit code per sample, high nibble first, channels
    * interleaved per nibble. Reconstruction:
    * `pred = (s1*c1 + s2*c2)/256 + signed(code)*delta`, clamped;
    * `delta = max(16, AdaptTable[code]*delta/256)`. Returns the mono mix.
    */
  private def decodeMsAdpcm(bytes: Array[Byte], off: Int, len: Int,
      channels: Int, blockAlign: Int): Option[Array[Double]] = {
    val headerPer = 7
    if (channels <= 0 || blockAlign < headerPer * channels) return None
    def le16s(o: Int): Int =
      ((bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)).toShort.toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    val c1 = new Array[Int](channels)
    val c2 = new Array[Int](channels)
    val delta = new Array[Int](channels)
    val s1 = new Array[Int](channels)
    val s2 = new Array[Int](channels)
    var block = off
    val end = off + len
    while (block + headerPer * channels <= end) {
      val blockEnd = math.min(block + blockAlign, end)
      var c = 0
      while (c < channels) {
        val pidx = math.min(6, bytes(block + c) & 0xff)
        c1(c) = MsCoeff1(pidx); c2(c) = MsCoeff2(pidx)
        delta(c) = le16s(block + channels + c * 2)
        if (delta(c) < 16) delta(c) = 16
        s1(c) = le16s(block + 3 * channels + c * 2)
        s2(c) = le16s(block + 5 * channels + c * 2)
        c += 1
      }
      // the two stored samples open the block, older (s2) first
      out += (0 until channels).map(s2(_) / 32768.0).sum / channels
      out += (0 until channels).map(s1(_) / 32768.0).sum / channels
      var pos = block + headerPer * channels
      var nibHigh = true
      var ch = 0
      var sum = 0.0
      while (pos < blockEnd) {
        val b = bytes(pos) & 0xff
        val code = if (nibHigh) b >> 4 else b & 0x0f
        val signed = if (code >= 8) code - 16 else code
        var p = (s1(ch) * c1(ch) + s2(ch) * c2(ch)) / 256 + signed * delta(ch)
        if (p > 32767) p = 32767 else if (p < -32768) p = -32768
        s2(ch) = s1(ch); s1(ch) = p
        delta(ch) = math.max(16, MsAdaptTable(code) * delta(ch) / 256)
        sum += p / 32768.0
        ch += 1
        if (ch == channels) { out += sum / channels; sum = 0.0; ch = 0 }
        if (!nibHigh) pos += 1
        nibHigh = !nibHigh
      }
      block += blockAlign
    }
    if (out.isEmpty) None else Some(out.toArray)
  }

  /** IMA ADPCM encoder (the spec's quantizer: greedy step-fraction
    * subtraction, then the SAME reconstruction arithmetic as the decoder
    * to keep encoder and decoder predictors in lockstep). Mono or
    * stereo; `samplesPerBlock - 1` must divide by 8 so nibble groups
    * fill exactly.
    */
  private[graft] def encodeWavImaAdpcm(sampleRate: Int, channels: Int,
      samples: Array[Short], samplesPerBlock: Int = 505): Array[Byte] = {
    require(channels == 1 || channels == 2, "mono or stereo")
    require((samplesPerBlock - 1) % 8 == 0, "samplesPerBlock-1 must divide by 8")
    val blockAlign = 4 * channels + (samplesPerBlock - 1) / 2 * channels
    val nBlocks = (samples.length + samplesPerBlock - 1) / math.max(samplesPerBlock, 1)
    val dataLen = nBlocks * blockAlign
    val out = java.nio.ByteBuffer.allocate(44 + 4 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(40 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11) // IMA ADPCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign / math.max(samplesPerBlock, 1))
      .putShort(blockAlign.toShort)
      .putShort(4) // bits per sample
      .putShort(2) // cbSize
      .putShort(samplesPerBlock.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    def quantize(c: Int, target: Int): Int = {
      val step = ImaStep(idx(c))
      var delta = target - pred(c)
      var n = 0
      if (delta < 0) { n = 8; delta = -delta }
      if (delta >= step) { n |= 4; delta -= step }
      if (delta >= (step >> 1)) { n |= 2; delta -= step >> 1 }
      if (delta >= (step >> 2)) n |= 1
      val (p, i2) = imaStepNibble(n, pred(c), idx(c))
      pred(c) = p; idx(c) = i2
      n
    }
    def sampleAt(i: Int, c: Int): Int =
      if (i < samples.length) samples(i).toInt else 0
    var base = 0
    var b = 0
    while (b < nBlocks) {
      var c = 0
      while (c < channels) {
        // mono source duplicated across channels (matches encodeWavPcm16)
        pred(c) = sampleAt(base, c)
        idx(c) = if (b == 0) 0 else idx(c) // carry tuned index across blocks
        out.putShort(pred(c).toShort).put(idx(c).toByte).put(0.toByte)
        c += 1
      }
      var s = 1
      while (s < samplesPerBlock) { // groups of 8 samples per channel
        var c2 = 0
        while (c2 < channels) {
          var k = 0
          var acc = 0L
          while (k < 8) {
            val n = quantize(c2, sampleAt(base + s + k, c2))
            acc |= (n.toLong & 0xf) << (4 * k)
            k += 1
          }
          out.putInt(acc.toInt)
          c2 += 1
        }
        s += 8
      }
      base += samplesPerBlock
      b += 1
    }
    out.array()
  }

  /** Canonical RIFF/WAVE writer for 16-bit signed little-endian PCM:
    * the same frame is written to every channel (so [[decodeWav]]'s mono
    * mix reproduces the input exactly — `s/32768` is a dyadic rational,
    * hence an EXACT double). The `mm_audio` board row encodes through
    * this, decodes through the real [[decodeWav]] chunk walk, and its
    * DuckDB oracle recomputes the features from the generator formula —
    * a bit-exact round-trip gate on the whole codec path.
    */
  private[graft] def encodeWavPcm16(
      sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * channels * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) {
      var c = 0
      while (c < channels) { out.putShort(samples(i)); c += 1 }
      i += 1
    }
    out.array()
  }

  /** Minimal RIFF/AVI writer for a single `vids`/`DIB ` stream of
    * BI_RGB 24bpp bottom-up frames (the public AVI-1.0 layout:
    * `RIFF('AVI ') -> LIST hdrl (avih, LIST strl (strh, strf)) ->
    * LIST movi (00db...)`) — the encode half mm_scene_cut round-trips
    * through the real [[aviFramePixels]] container walk + DIB decode.
    * Each frame is `h` bottom-up rows of BGR triples (stride padded to
    * 4 bytes by the caller if w*3 % 4 != 0; 8-wide frames need none).
    */
  private[graft] def encodeAviDib(w: Int, h: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length & 1
      val buf = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      buf.array()
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("LIST".getBytes("US-ASCII")).putInt(4 + body.length)
        .put(listType.getBytes("US-ASCII")).put(body)
      buf.array()
    }
    val strh = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII")).put("DIB ".getBytes("US-ASCII"))
    val strf = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    val avih = new Array[Byte](56)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val movi = list("movi", frames.flatMap(f => chunk("00db", f)).toArray)
    val body = hdrl ++ movi
    val buf = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    buf.array()
  }

  /** Partition-wise REAL audio feature extraction over decodable PCM
    * WAVs (everything else drops out): duration, RMS energy,
    * zero-crossing rate, peak — the audio-quality stage of a speech
    * training pipeline.
    */
  def audioFeatures(ds: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    implicit val enc: Encoder[AudioFeatures] = Encoders.product[AudioFeatures]
    ds.mapPartitions { it =>
      it.flatMap { r =>
        decodeWav(r.bytes).map { case (rate, ch, bps, mono) =>
          val n = mono.length
          var sumSq = 0.0
          var peak = 0.0
          var crossings = 0
          var i = 0
          while (i < n) {
            val v = mono(i)
            sumSq += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            if (i > 0 && (mono(i - 1) >= 0) != (v >= 0)) crossings += 1
            i += 1
          }
          AudioFeatures(r.id, rate, ch, bps, n,
            if (rate > 0) n.toDouble / rate else 0.0,
            math.sqrt(sumSq / math.max(n, 1)),
            if (n > 1) crossings.toDouble / (n - 1) else 0.0,
            peak)
        }
      }
    }
  }

  /** Extract the video frames of an AVI: walk the RIFF tree to the `movi`
    * LIST and collect the payload of every video chunk (`##dc` compressed /
    * `##db` uncompressed, optionally nested in `rec ` LISTs — public AVI
    * RIFF layout; the reference never parses containers, its streams hand
    * it text lines). Same corrupt-length discipline as [[probeVideo]]:
    * every cursor advance is strictly forward or the walk stops — a forged
    * 32-bit size must not hang an executor.
    *
    * For MJPEG AVIs each payload is a complete JFIF image, so
    * [[decodePixelsAny]] (JRE JPEG decoder) turns a frame into real pixels
    * with no codec libs: container walk + frame pixels are fully real, and
    * [[decodeStub]] is left covering only inter-coded codecs (H.264 etc.).
    */
  private[graft] def aviVideoFrames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = try {
    def le32(o: Int): Long =
      (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def fourcc(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      return IndexedSeq.empty
    val frames = IndexedSeq.newBuilder[Array[Byte]]
    def isVideoChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.endsWith("dc") || id.endsWith("db"))
    def walkChunks(from: Long, until: Long, depth: Int): Unit = {
      var o = from
      while (o + 8 <= until) {
        val id = fourcc(o.toInt)
        val sz = le32(o.toInt + 4)
        val payload = o + 8
        if (payload + sz > until) return // truncated: stop cleanly
        if (id == "LIST" && sz >= 4 && depth < 8) {
          val listType = fourcc(payload.toInt)
          if (listType == "movi" || listType == "rec ")
            walkChunks(payload + 4, payload + sz, depth + 1)
        } else if (isVideoChunk(id) && sz > 0) {
          frames += java.util.Arrays.copyOfRange(bytes, payload.toInt, (payload + sz).toInt)
        }
        val no = payload + sz + (sz & 1) // chunks pad to even
        if (no <= o) return              // corrupt size: stop cleanly
        o = no
      }
    }
    walkChunks(12L, bytes.length.toLong, 0)
    frames.result()
  } catch { case _: Exception => IndexedSeq.empty }

  /** Pixel format of an AVI's first video stream, from the
    * `hdrl → strl → strf` BITMAPINFOHEADER (public RIFF/AVI layout).
    * DIB frame payloads are HEADERLESS — width/height/bit depth/palette
    * live only here, so `##db`/RLE `##dc` chunks cannot be decoded from
    * their own bytes the way MJPEG JPEGs can. Palette entries are
    * re-ordered BGR0 → RGB triples at parse time. `topDown` mirrors a
    * negative biHeight (rows top-down instead of the DIB default
    * bottom-up).
    */
  private[graft] case class AviStreamFormat(width: Int, height: Int,
      bitCount: Int, compression: Int, palette: Array[Byte], topDown: Boolean)

  private[graft] def aviStreamFormat(bytes: Array[Byte]): Option[AviStreamFormat] = try {
    def le32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def fourcc(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      return None
    var result: Option[AviStreamFormat] = None
    // one strl LIST = one stream: strh names the type, the strf that
    // follows in the SAME list carries its format
    def scanStrl(from: Int, until: Int): Unit = {
      var o = from
      var vids = false
      while (o + 8 <= until && result.isEmpty) {
        val id = fourcc(o)
        val sz = le32(o + 4)
        val p = o + 8
        if (sz < 0 || p + sz > until) return
        if (id == "strh" && sz >= 4) vids = fourcc(p) == "vids"
        else if (id == "strf" && vids && sz >= 40) {
          val biSize = le32(p)
          val w = le32(p + 4)
          val hRaw = le32(p + 8)
          val bpp = le16(p + 14)
          val comp = le32(p + 16)
          val clrUsed = le32(p + 32)
          val nColors =
            if (bpp > 8) 0 else if (clrUsed > 0) math.min(clrUsed, 256) else 1 << bpp
          val pal = new Array[Byte](nColors * 3)
          var c = 0
          while (c < nColors && p + biSize + c * 4 + 4 <= p + sz) {
            val q = p + biSize + c * 4 // RGBQUAD is B,G,R,reserved
            pal(c * 3) = bytes(q + 2); pal(c * 3 + 1) = bytes(q + 1)
            pal(c * 3 + 2) = bytes(q)
            c += 1
          }
          result = Some(AviStreamFormat(w, math.abs(hRaw), bpp, comp, pal, hRaw < 0))
        }
        val no = p.toLong + sz + (sz & 1)
        if (no <= o) return
        o = no.toInt
      }
    }
    def walk(from: Int, until: Int, depth: Int): Unit = {
      var o = from
      while (o + 8 <= until && result.isEmpty) {
        val id = fourcc(o)
        val sz = le32(o + 4)
        val p = o + 8
        if (sz < 0 || p + sz > until) return
        if (id == "LIST" && sz >= 4 && depth < 8) {
          val lt = fourcc(p)
          if (lt == "strl") scanStrl(p + 4, p + sz)
          else if (lt == "hdrl") walk(p + 4, p + sz, depth + 1)
        }
        val no = p.toLong + sz + (sz & 1)
        if (no <= o) return
        o = no.toInt
      }
    }
    walk(12, bytes.length, 0)
    result
  } catch { case _: Exception => None }

  /** Decode one DIB frame payload to RGB pixels with the stream format:
    * BI_RGB raw (8-bit palette, 24-bit BGR, 32-bit BGRA; rows padded to 4
    * bytes, bottom-up unless `topDown`) and BI_RLE8 (run/escape/absolute/
    * delta opcodes per the public BMP RLE8 spec — always bottom-up).
    * Corrupt payloads return None; every loop advance is strictly
    * forward, same discipline as [[aviVideoFrames]].
    */
  private[graft] def decodeDibFrame(fmt: AviStreamFormat,
      payload: Array[Byte]): Option[PixelImage] = try {
    val w = fmt.width
    val h = fmt.height
    if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
    def srcRow(y: Int): Int = if (fmt.topDown) y else h - 1 - y
    fmt.compression match {
      case 0 if fmt.bitCount == 24 || fmt.bitCount == 32 =>
        val bpx = fmt.bitCount / 8
        val stride = ((w * bpx + 3) / 4) * 4
        if (stride.toLong * h > payload.length) return None
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          val ro = srcRow(y) * stride
          var x = 0
          while (x < w) {
            val s = ro + x * bpx
            val d = (y * w + x) * 3
            out(d) = payload(s + 2); out(d + 1) = payload(s + 1)
            out(d + 2) = payload(s) // BGR(A) → RGB
            x += 1
          }
          y += 1
        }
        Some(PixelImage(w, h, 3, out))
      case 0 if fmt.bitCount == 8 =>
        if (fmt.palette.isEmpty) return None
        val stride = ((w + 3) / 4) * 4
        if (stride.toLong * h > payload.length) return None
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          val ro = srcRow(y) * stride
          var x = 0
          while (x < w) {
            val v = (payload(ro + x) & 0xff) * 3
            val d = (y * w + x) * 3
            if (v + 2 < fmt.palette.length) {
              out(d) = fmt.palette(v); out(d + 1) = fmt.palette(v + 1)
              out(d + 2) = fmt.palette(v + 2)
            }
            x += 1
          }
          y += 1
        }
        Some(PixelImage(w, h, 3, out))
      case 1 if fmt.bitCount == 8 =>
        if (fmt.palette.isEmpty) return None
        // RLE8 raster is always bottom-up; decode indices first
        val idx = new Array[Byte](w * h)
        var x = 0
        var row = 0 // bottom-up row cursor
        var i = 0
        var eof = false
        while (!eof && i + 1 < payload.length && row < h) {
          val b0 = payload(i) & 0xff
          val b1 = payload(i + 1) & 0xff
          i += 2
          if (b0 > 0) { // encoded run: b0 copies of index b1
            var k = 0
            while (k < b0 && x < w) { idx(row * w + x) = b1.toByte; x += 1; k += 1 }
          } else b1 match {
            case 0 => x = 0; row += 1 // end of line
            case 1 => eof = true      // end of bitmap
            case 2 =>                 // delta (dx, dy)
              if (i + 1 < payload.length) {
                x += payload(i) & 0xff; row += payload(i + 1) & 0xff; i += 2
              } else eof = true
            case n =>                 // absolute: n literal indices, word-aligned
              var k = 0
              while (k < n && i < payload.length) {
                if (x < w && row < h) { idx(row * w + x) = payload(i); x += 1 }
                i += 1; k += 1
              }
              if ((n & 1) == 1) i += 1
          }
        }
        val out = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var xx = 0
          while (xx < w) {
            val v = (idx((h - 1 - y) * w + xx) & 0xff) * 3
            val d = (y * w + xx) * 3
            if (v + 2 < fmt.palette.length) {
              out(d) = fmt.palette(v); out(d + 1) = fmt.palette(v + 1)
              out(d + 2) = fmt.palette(v + 2)
            }
            xx += 1
          }
          y += 1
        }
        Some(PixelImage(w, h, 3, out))
      case _ => None
    }
  } catch { case _: Exception => None }

  /** Pixel-decode every video frame of an AVI: MJPEG payloads through
    * [[decodePixelsAny]] (JRE JPEG decoder), BI_RGB raw-DIB and BI_RLE8
    * payloads through [[decodeDibFrame]] with the [[aviStreamFormat]]
    * header (they are headerless on their own). With this,
    * [[decodeStub]] covers ONLY genuinely inter-coded codecs.
    */
  private[graft] def aviFramePixels(bytes: Array[Byte]): IndexedSeq[PixelImage] = {
    val fmt = aviStreamFormat(bytes)
    aviVideoFrames(bytes).flatMap { f =>
      fmt match {
        case Some(sf) if sf.compression == 0 || sf.compression == 1 =>
          decodeDibFrame(sf, f)
        case _ => decodePixelsAny(f)
      }
    }
  }

  /** STUB decoder: a real build replaces this with the native decode; the
    * fake derives deterministic "dimensions" from the payload and computes
    * a real 4-bin byte histogram (honest binary-column compute).
    * With [[aviVideoFrames]] + [[decodeDibFrame]] + [[decodeWav]] (PCM
    * and IMA ADPCM) landed, this stub covers only payloads with NO
    * pure-JVM decode path left: inter-coded video codecs (H.264 etc.)
    * and transform-coded audio (MP3/AAC).
    */
  private[streaming] def decodeStub(bytes: Array[Byte]): (Int, Int, Int, Array[Double]) = {
    val hist = new Array[Double](4)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xff) >> 6) += 1; i += 1 }
    val n = math.max(bytes.length, 1)
    // Long product: length*7 wraps Int past ~306 MB payloads, and Scala %
    // keeps the overflowed sign — a negative stub height (round-13 review)
    (bytes.length % 640, (bytes.length.toLong * 7 % 480).toInt,
      bytes.length % 30 + 1,
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
        // real dimensions for recognized uncompressed formats (single
        // frame for stills) and recognized video containers; stub
        // dimensions otherwise
        val (w, h, nf) = decodeDims(r.bytes)
          .map { case (rw, rh) => (rw, rh, 1) }
          .orElse(probeVideo(r.bytes)
            .map(v => (v.width, v.height, math.max(v.frames, 1))))
          .getOrElse((sw, sh, frames))
        MediaFeatures(r.id, r.kind, r.bytes.length, hash, w, h, nf, hist)
      }
    }

  /** Frame sampling: explode every `everyN`-th frame of a media record.
    * AVI records yield their REAL video chunks (for MJPEG, each a complete
    * JPEG [[decodePixelsAny]] can pixel-decode); other containers fall
    * back to stub byte slices until their codecs have a JVM decode path.
    */
  def frameSample(ds: Dataset[MediaRecord], everyN: Int): Dataset[FrameSample] = {
    // fail at the method boundary, not as a per-record Range
    // IllegalArgumentException inside an executor task (and a negative
    // everyN would silently yield zero frames rather than erroring)
    require(everyN > 0, s"everyN must be positive, got $everyN")
    ds.flatMap { r =>
      val avi = aviVideoFrames(r.bytes)
      if (avi.nonEmpty)
        (0 until avi.length by everyN).map(f => FrameSample(r.id, f, avi(f)))
      else {
        val (_, _, frames, _) = decodeStub(r.bytes)
        (0 until frames by everyN).map { f =>
          val span = math.max(r.bytes.length / frames, 1)
          val from = math.min(f * span, r.bytes.length)
          val until = math.min(from + span, r.bytes.length)
          FrameSample(r.id, f, java.util.Arrays.copyOfRange(r.bytes, from, until))
        }
      }
    }
  }
}
