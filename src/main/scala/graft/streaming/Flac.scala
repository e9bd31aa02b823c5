package graft.streaming

/** Pure-JVM FLAC codec (public xiph.org FLAC format spec / RFC 9639):
  * a real encoder (fixed predictors order 0-2, Rice-coded residuals,
  * verbatim fallback, per-frame CRC-8/CRC-16) and a decoder covering the
  * full subframe set — CONSTANT, VERBATIM, FIXED 0-4, LPC 1-32 — with
  * both Rice residual methods, partition orders, wasted bits, all block
  * size / sample rate / sample size codes, UTF-8 coded frame numbers,
  * and the three stereo decorrelation modes (left/side, right/side,
  * mid/side). Lossless by construction: decode(encode(pcm)) must
  * bit-equal pcm, which is what the mm_flac board row hash-gates.
  *
  * Shrinks the declared perceptual-codec stub surface (round-8 verdict
  * stretch item): FLAC is fully specified and integer-exact, so unlike
  * MP3/AAC it fits the engine's bit-replayable oracle discipline at the
  * existing WAV seam ([[Multimodal.decodeWav]] feature conventions).
  *
  * Malformed-stream contract matches the other codecs here: truncated
  * or corrupt input yields the frames decoded so far (empty for a broken
  * header), never a throw.
  */
object Flac {

  // ---------------------------------------------------------------- bits

  private[graft] final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nAcc = 0
    def writeBits(value: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >>> i) & 1L)
        nAcc += 1
        if (nAcc == 8) { buf.write(acc.toInt & 0xff); acc = 0L; nAcc = 0 }
        i -= 1
      }
    }
    def writeUnary(q: Int): Unit = { writeBits(0L, q); writeBits(1L, 1) }
    def alignByte(): Unit = if (nAcc > 0) writeBits(0L, 8 - nAcc)
    def toBytes: Array[Byte] = { alignByte(); buf.toByteArray }
  }

  private[graft] final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var bit = 0
    def bytePos: Int = pos
    def atByteBoundary: Boolean = bit == 0
    def eof: Boolean = pos >= bytes.length
    def readBit(): Int = {
      if (pos >= bytes.length) throw new java.io.EOFException
      val b = (bytes(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      b
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Two's-complement signed read. */
    def readSigned(n: Int): Long = {
      val v = readBits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  // ---------------------------------------------------------------- crc

  private[graft] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  private[graft] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc =
          if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ------------------------------------------------------------- encoder

  /** Encode 16-bit PCM as a FLAC stream; the same `pcm` frame is written
    * to every channel (the [[Multimodal.encodeWavPcm16]] convention, so
    * the mono mix is unchanged). Each block picks the fixed-predictor
    * order 0-2 with the smallest residual-magnitude sum and Rice-codes
    * one partition; blocks whose Rice rendering would exceed verbatim
    * fall back to verbatim. Returns the full stream: fLaC marker,
    * STREAMINFO, frames with valid CRC-8/CRC-16.
    */
  def encodeFlac(sampleRate: Int, channels: Int, pcm: Array[Short],
      blockSize: Int = 1024): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels $channels")
    require(blockSize >= 16 && blockSize <= 65535, s"blockSize $blockSize")
    // STREAMINFO's sample-rate field is 20 bits; writeBits would
    // silently truncate a larger rate (1100000 -> 51424) and the stream
    // would decode with the wrong rate — refuse it at encode time
    require(sampleRate >= 1 && sampleRate < (1 << 20),
      s"sampleRate $sampleRate exceeds FLAC's 20-bit STREAMINFO field")
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (type 0, last metadata block), 34 bytes
    val si = new BitWriter
    si.writeBits(blockSize.toLong, 16) // min block size
    si.writeBits(blockSize.toLong, 16) // max block size
    si.writeBits(0L, 24) // min frame size unknown
    si.writeBits(0L, 24) // max frame size unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits((channels - 1).toLong, 3)
    si.writeBits(15L, 5) // bits per sample - 1 = 15
    si.writeBits(pcm.length.toLong, 36)
    si.writeBits(0L, 64); si.writeBits(0L, 64) // md5 unset (zeros = unknown)
    val siBytes = si.toBytes
    out.write(0x80) // last-metadata-block flag | type 0
    out.write(0); out.write(0); out.write(siBytes.length) // 34
    out.write(siBytes, 0, siBytes.length)
    var frameNo = 0L
    var off = 0
    while (off < pcm.length) {
      val n = math.min(blockSize, pcm.length - off)
      val w = new BitWriter
      w.writeBits(0x3ffe, 14) // sync
      w.writeBits(0L, 1) // reserved
      w.writeBits(0L, 1) // fixed blocking strategy (frame number coded)
      // block size: always the explicit 16-bit form (code 7) — simplest
      // spec-valid rendering for arbitrary tail blocks
      w.writeBits(7L, 4)
      w.writeBits(0L, 4) // sample rate: from STREAMINFO
      w.writeBits((channels - 1).toLong, 4) // independent channels
      w.writeBits(4L, 3) // sample size code 4 = 16 bits
      w.writeBits(0L, 1) // reserved
      writeUtf8Number(w, frameNo)
      w.writeBits((n - 1).toLong, 16) // 16-bit block size - 1
      val headerBytes = w.toBytes // byte-aligned: all fields above are 40+8k bits
      val frame = new java.io.ByteArrayOutputStream()
      frame.write(headerBytes, 0, headerBytes.length)
      frame.write(crc8(headerBytes, 0, headerBytes.length))
      // subframes (same content per channel), then footer CRC-16
      val sw = new BitWriter
      var ch = 0
      while (ch < channels) {
        writeSubframe(sw, pcm, off, n)
        ch += 1
      }
      val sub = sw.toBytes // alignByte pads the last partial byte with 0s
      frame.write(sub, 0, sub.length)
      val fb = frame.toByteArray
      val c16 = crc16(fb, 0, fb.length)
      frame.write((c16 >> 8) & 0xff); frame.write(c16 & 0xff)
      val all = frame.toByteArray
      out.write(all, 0, all.length)
      frameNo += 1
      off += n
    }
    out.toByteArray
  }

  private[graft] def writeUtf8Number(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) w.writeBits(v, 8)
    else if (v < 0x800) {
      w.writeBits(0xc0L | (v >> 6), 8); w.writeBits(0x80L | (v & 0x3f), 8)
    } else if (v < 0x10000) {
      w.writeBits(0xe0L | (v >> 12), 8)
      w.writeBits(0x80L | ((v >> 6) & 0x3f), 8)
      w.writeBits(0x80L | (v & 0x3f), 8)
    } else if (v < 0x200000) {
      w.writeBits(0xf0L | (v >> 18), 8)
      w.writeBits(0x80L | ((v >> 12) & 0x3f), 8)
      w.writeBits(0x80L | ((v >> 6) & 0x3f), 8)
      w.writeBits(0x80L | (v & 0x3f), 8)
    } else if (v < 0x4000000) {
      // 5-7-byte tiers: frame numbers past 2^21 are reachable well inside
      // the 36-bit STREAMINFO sample budget (~33.5M samples at the minimum
      // block size), and the encoder previously spilled v>>18 into the
      // length-prefix bits there, emitting a silently-misparsed stream
      // (round-9 advice). The decoder above already reads all tiers.
      w.writeBits(0xf8L | (v >> 24), 8)
      var sh = 18
      while (sh >= 0) { w.writeBits(0x80L | ((v >> sh) & 0x3f), 8); sh -= 6 }
    } else if (v < 0x80000000L) {
      w.writeBits(0xfcL | (v >> 30), 8)
      var sh = 24
      while (sh >= 0) { w.writeBits(0x80L | ((v >> sh) & 0x3f), 8); sh -= 6 }
    } else {
      require(v < (1L << 36), s"utf8-coded number out of 36-bit range: $v")
      w.writeBits(0xfeL, 8)
      var sh = 30
      while (sh >= 0) { w.writeBits(0x80L | ((v >> sh) & 0x3f), 8); sh -= 6 }
    }
  }

  private def writeSubframe(w: BitWriter, pcm: Array[Short], off: Int,
      n: Int): Unit = {
    // constant shortcut
    var allSame = true
    var i = 1
    while (allSame && i < n) { allSame = pcm(off + i) == pcm(off); i += 1 }
    if (allSame && n > 0) {
      w.writeBits(0L, 1); w.writeBits(0L, 6); w.writeBits(0L, 1)
      w.writeBits(pcm(off).toLong & 0xffff, 16)
      return
    }
    // pick fixed order 0-2 by residual magnitude sum
    def residual(order: Int): Array[Long] = {
      val r = new Array[Long](n - order)
      var j = order
      while (j < n) {
        val v: Long = order match {
          case 0 => pcm(off + j).toLong
          case 1 => pcm(off + j).toLong - pcm(off + j - 1)
          case _ => pcm(off + j).toLong - 2L * pcm(off + j - 1) + pcm(off + j - 2)
        }
        r(j - order) = v
        j += 1
      }
      r
    }
    var bestOrder = 0
    var bestSum = Long.MaxValue
    var bestRes: Array[Long] = null
    var o = 0
    while (o <= math.min(2, n - 1)) {
      val r = residual(o)
      var s = 0L
      r.foreach(v => s += math.abs(v))
      if (s < bestSum) { bestSum = s; bestOrder = o; bestRes = r }
      o += 1
    }
    // Rice parameter from the mean folded magnitude (standard estimator)
    val mean = if (bestRes.isEmpty) 0L else (2 * bestSum) / math.max(1, bestRes.length)
    var k = 0
    while ((1L << k) < mean + 1 && k < 14) k += 1
    // estimated rice size vs verbatim
    var riceBits = 0L
    bestRes.foreach { v =>
      val u = if (v >= 0) v << 1 else ((-v) << 1) - 1
      riceBits += (u >>> k) + 1 + k
    }
    val fixedBits = bestOrder * 16L + 2 + 4 + 4 + riceBits
    if (fixedBits >= 16L * n) {
      // verbatim
      w.writeBits(0L, 1); w.writeBits(1L, 6); w.writeBits(0L, 1)
      var j = 0
      while (j < n) { w.writeBits(pcm(off + j).toLong & 0xffff, 16); j += 1 }
      return
    }
    // fixed subframe: type 0b001000 | order
    w.writeBits(0L, 1); w.writeBits(8L | bestOrder.toLong, 6); w.writeBits(0L, 1)
    var j = 0
    while (j < bestOrder) { w.writeBits(pcm(off + j).toLong & 0xffff, 16); j += 1 }
    // residual: method 0 (4-bit rice), partition order 0
    w.writeBits(0L, 2)
    w.writeBits(0L, 4)
    w.writeBits(k.toLong, 4)
    bestRes.foreach { v =>
      val u = if (v >= 0) v << 1 else ((-v) << 1) - 1
      w.writeUnary((u >>> k).toInt)
      w.writeBits(u & ((1L << k) - 1), k)
    }
  }

  // ------------------------------------------------------------- decoder

  /** Decoded stream: (sampleRate, channels, bitsPerSample, per-channel
    * samples). Truncated/corrupt input returns the frames decoded so far.
    */
  final case class FlacAudio(sampleRate: Int, channels: Int, bps: Int,
      samples: Array[Array[Int]], nFrames: Int)

  def decodeFlacPcm(bytes: Array[Byte]): Option[FlacAudio] = try {
    if (bytes.length < 42) return None
    if (bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' || bytes(3) != 'C')
      return None
    var pos = 4
    var siRate = 0; var siCh = 0; var siBps = 0
    var last = false
    var sawStreamInfo = false
    while (!last) {
      if (pos + 4 > bytes.length) return None
      val h = bytes(pos) & 0xff
      last = (h & 0x80) != 0
      val tpe = h & 0x7f
      val len = ((bytes(pos + 1) & 0xff) << 16) | ((bytes(pos + 2) & 0xff) << 8) |
        (bytes(pos + 3) & 0xff)
      pos += 4
      if (tpe == 0 && len >= 34 && pos + 34 <= bytes.length) {
        val r = new BitReader(bytes, pos)
        r.readBits(16); r.readBits(16); r.readBits(24); r.readBits(24)
        siRate = r.readBits(20).toInt
        siCh = r.readBits(3).toInt + 1
        siBps = r.readBits(5).toInt + 1
        sawStreamInfo = true
      }
      pos += len
      if (pos > bytes.length) return None
    }
    if (!sawStreamInfo) return None
    val chans = Array.fill(siCh)(new scala.collection.mutable.ArrayBuffer[Int]())
    var nFrames = 0
    try {
      while (pos < bytes.length) {
        pos = decodeFrame(bytes, pos, siRate, siCh, siBps, chans)
        nFrames += 1
      }
    } catch { case _: Exception => () } // truncated mid-frame: keep prior frames
    Some(FlacAudio(siRate, siCh, siBps, chans.map(_.toArray), nFrames))
  } catch { case _: Exception => None }

  /** Decode one frame starting at `pos`; returns the position after it.
    * Throws on malformed data (caller keeps prior frames).
    */
  private def decodeFrame(bytes: Array[Byte], pos: Int, siRate: Int,
      siCh: Int, siBps: Int,
      chans: Array[scala.collection.mutable.ArrayBuffer[Int]]): Int = {
    val r = new BitReader(bytes, pos)
    if (r.readBits(14) != 0x3ffe) throw new java.io.IOException("bad sync")
    r.readBits(1) // reserved
    r.readBits(1) // blocking strategy
    val bsCode = r.readBits(4).toInt
    val srCode = r.readBits(4).toInt
    val chAsgn = r.readBits(4).toInt
    val ssCode = r.readBits(3).toInt
    r.readBits(1) // reserved
    readUtf8Number(r) // frame/sample number (position tracked implicitly)
    val blockSize = bsCode match {
      case 1 => 192
      case c if c >= 2 && c <= 5 => 576 << (c - 2)
      case 6 => r.readBits(8).toInt + 1
      case 7 => r.readBits(16).toInt + 1
      case c if c >= 8 => 256 << (c - 8)
      case _ => throw new java.io.IOException("reserved block size")
    }
    srCode match { // value unused beyond validation (STREAMINFO wins)
      case 12 => r.readBits(8)
      case 13 | 14 => r.readBits(16)
      // RFC 9639: 0b1111 is forbidden exactly to prevent sync-fooling —
      // reject like the sibling reserved codes instead of accepting it
      // (round-13 kernel review; ssCode/bsCode already throw)
      case 15 => throw new java.io.IOException("forbidden sample rate code")
      case _ =>
    }
    val headerEnd = r.bytePos // CRC-8 covers [pos, headerEnd)
    val hCrc = r.readBits(8).toInt
    if (crc8(bytes, pos, headerEnd) != hCrc)
      throw new java.io.IOException("header crc")
    // RFC 9639 marks 0b1011-0b1111 reserved (decoder MUST reject);
    // falling through to the 2-channel independent path would decode
    // wrong samples with no error (round-13 kernel review)
    if (chAsgn > 10)
      throw new java.io.IOException("reserved channel assignment")
    val nCh = if (chAsgn <= 7) chAsgn + 1 else 2
    if (nCh != siCh) throw new java.io.IOException("channel mismatch")
    val bps = ssCode match {
      case 0 => siBps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => throw new java.io.IOException("reserved sample size")
    }
    val decoded = Array.ofDim[Array[Long]](nCh)
    var ch = 0
    while (ch < nCh) {
      // stereo decorrelation: the side channel carries one extra bit
      val extra = chAsgn match {
        case 8 => if (ch == 1) 1 else 0 // left/side
        case 9 => if (ch == 0) 1 else 0 // side/right
        case 10 => if (ch == 1) 1 else 0 // mid/side
        case _ => 0
      }
      decoded(ch) = decodeSubframe(r, blockSize, bps + extra)
      ch += 1
    }
    r.align()
    val frameEnd = r.bytePos
    val fCrc = r.readBits(16).toInt
    if (crc16(bytes, pos, frameEnd) != fCrc)
      throw new java.io.IOException("frame crc")
    // undo stereo decorrelation (per spec)
    val outCh: Array[Array[Long]] = chAsgn match {
      case 8 => // left/side: right = left - side
        val l = decoded(0); val s = decoded(1)
        Array(l, Array.tabulate(blockSize)(i => l(i) - s(i)))
      case 9 => // side/right: left = side + right
        val s = decoded(0); val rt = decoded(1)
        Array(Array.tabulate(blockSize)(i => s(i) + rt(i)), rt)
      case 10 => // mid/side
        val m = decoded(0); val s = decoded(1)
        val left = Array.tabulate(blockSize) { i =>
          val mid2 = (m(i) << 1) | (s(i) & 1L)
          (mid2 + s(i)) >> 1
        }
        val right = Array.tabulate(blockSize) { i =>
          val mid2 = (m(i) << 1) | (s(i) & 1L)
          (mid2 - s(i)) >> 1
        }
        Array(left, right)
      case _ => decoded
    }
    var c = 0
    while (c < nCh) {
      var i = 0
      while (i < blockSize) { chans(c) += outCh(c)(i).toInt; i += 1 }
      c += 1
    }
    r.bytePos
  }

  private[graft] def readUtf8Number(r: BitReader): Long = {
    val b0 = r.readBits(8).toInt
    var extra = 0
    var v = 0L
    if ((b0 & 0x80) == 0) return b0.toLong
    else if ((b0 & 0xe0) == 0xc0) { extra = 1; v = b0 & 0x1f }
    else if ((b0 & 0xf0) == 0xe0) { extra = 2; v = b0 & 0x0f }
    else if ((b0 & 0xf8) == 0xf0) { extra = 3; v = b0 & 0x07 }
    else if ((b0 & 0xfc) == 0xf8) { extra = 4; v = b0 & 0x03 }
    else if ((b0 & 0xfe) == 0xfc) { extra = 5; v = b0 & 0x01 }
    else if (b0 == 0xfe) { extra = 6; v = 0 }
    else throw new java.io.IOException("bad utf8 number")
    var i = 0
    while (i < extra) {
      val b = r.readBits(8).toInt
      if ((b & 0xc0) != 0x80) throw new java.io.IOException("bad utf8 cont")
      v = (v << 6) | (b & 0x3f)
      i += 1
    }
    v
  }

  private def decodeSubframe(r: BitReader, n: Int, bps: Int): Array[Long] = {
    if (r.readBits(1) != 0) throw new java.io.IOException("subframe pad")
    val tpe = r.readBits(6).toInt
    var wasted = 0
    if (r.readBits(1) == 1) { wasted = r.readUnary() + 1 }
    val effBps = bps - wasted
    val out: Array[Long] =
      if (tpe == 0) { // constant
        val v = r.readSigned(effBps)
        Array.fill(n)(v)
      } else if (tpe == 1) { // verbatim
        Array.fill(n)(r.readSigned(effBps))
      } else if ((tpe & 0x38) == 0x08 && (tpe & 0x07) <= 4) { // fixed
        val order = tpe & 0x07
        val x = new Array[Long](n)
        var i = 0
        while (i < order) { x(i) = r.readSigned(effBps); i += 1 }
        val res = readResidual(r, n, order)
        i = order
        while (i < n) {
          val p: Long = order match {
            case 0 => 0L
            case 1 => x(i - 1)
            case 2 => 2 * x(i - 1) - x(i - 2)
            case 3 => 3 * x(i - 1) - 3 * x(i - 2) + x(i - 3)
            case _ => 4 * x(i - 1) - 6 * x(i - 2) + 4 * x(i - 3) - x(i - 4)
          }
          x(i) = res(i - order) + p
          i += 1
        }
        x
      } else if ((tpe & 0x20) == 0x20) { // LPC, order = (tpe & 0x1f) + 1
        val order = (tpe & 0x1f) + 1
        val x = new Array[Long](n)
        var i = 0
        while (i < order) { x(i) = r.readSigned(effBps); i += 1 }
        val precision = r.readBits(4).toInt + 1
        if (precision == 16) throw new java.io.IOException("bad qlp precision")
        val shift = r.readSigned(5).toInt
        if (shift < 0) throw new java.io.IOException("negative qlp shift")
        val coefs = Array.fill(order)(r.readSigned(precision))
        val res = readResidual(r, n, order)
        i = order
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j) * x(i - 1 - j); j += 1 }
          x(i) = res(i - order) + (acc >> shift)
          i += 1
        }
        x
      } else throw new java.io.IOException(s"reserved subframe type $tpe")
    if (wasted > 0) out.map(_ << wasted) else out
  }

  private def readResidual(r: BitReader, blockSize: Int,
      order: Int): Array[Long] = {
    val method = r.readBits(2).toInt
    if (method > 1) throw new java.io.IOException("reserved residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xf else 0x1f
    val partOrder = r.readBits(4).toInt
    val nParts = 1 << partOrder
    if (blockSize % nParts != 0) throw new java.io.IOException("bad partition")
    val out = new Array[Long](blockSize - order)
    var idx = 0
    var p = 0
    while (p < nParts) {
      val count = (blockSize >> partOrder) - (if (p == 0) order else 0)
      if (count < 0) throw new java.io.IOException("partition underflow")
      val param = r.readBits(paramBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < count) { out(idx) = r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary()
          val u = (q.toLong << param) | r.readBits(param)
          out(idx) = if ((u & 1) == 0) u >>> 1 else -((u + 1) >>> 1)
          idx += 1; i += 1
        }
      }
      p += 1
    }
    out
  }

  /** WAV-seam convenience mirroring [[Multimodal.decodeWav]]'s shape:
    * (sampleRate, channels, bitsPerSample, mono mix scaled to [-1, 1)).
    */
  def decodeFlac(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Double])] =
    decodeFlacPcm(bytes).filter(_.samples.forall(_.nonEmpty)).map { a =>
      val n = a.samples.map(_.length).min
      val scale = (1L << (a.bps - 1)).toDouble
      val mono = Array.tabulate(n) { i =>
        var s = 0.0
        var c = 0
        while (c < a.channels) { s += a.samples(c)(i) / scale; c += 1 }
        s / a.channels
      }
      (a.sampleRate, a.channels, a.bps, mono)
    }
}
