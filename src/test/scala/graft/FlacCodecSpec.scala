package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Flac
import graft.streaming.Flac.{BitReader, BitWriter}

/** The pure-JVM FLAC codec: lossless roundtrip across signal shapes,
  * block sizes and channel counts; decoder-only coverage of the subframe
  * types the encoder doesn't emit (LPC, rice escape, wasted bits, the
  * three stereo decorrelation modes) via hand-built spec-conformant
  * streams; CRC rejection; and the truncation partial-frames contract.
  */
class FlacCodecSpec extends AnyFunSuite {

  private def lcg(seed: Long, n: Int, mod: Int = 65536): Array[Short] =
    Array.tabulate(n)(i =>
      (((seed * 1103515245L + i * 12345L) % mod) - mod / 2).toShort)

  test("roundtrip: lossless across signal shapes, block sizes, channels") {
    val signals = Seq(
      "noise" -> lcg(7, 1000),
      "quiet" -> lcg(3, 500, 64),
      "constant" -> Array.fill(300)(1234.toShort),
      "ramp" -> Array.tabulate(700)(i => (i * 3 - 1000).toShort),
      "extremes" -> Array.tabulate(100)(i =>
        if (i % 2 == 0) Short.MaxValue else Short.MinValue),
      "short" -> lcg(11, 17),
      "sine-ish" -> Array.tabulate(800)(i =>
        (math.sin(i * 0.1) * 20000).toShort))
    for ((name, pcm) <- signals; bs <- Seq(64, 256, 1024); ch <- Seq(1, 2)) {
      val enc = Flac.encodeFlac(8000, ch, pcm, blockSize = bs)
      val dec = Flac.decodeFlacPcm(enc).getOrElse(
        fail(s"$name bs=$bs ch=$ch failed to decode"))
      assert(dec.sampleRate == 8000 && dec.channels == ch && dec.bps == 16)
      (0 until ch).foreach { c =>
        assert(dec.samples(c).toSeq == pcm.map(_.toInt).toSeq,
          s"$name bs=$bs ch=$ch channel $c not lossless")
      }
    }
  }

  test("encoder compresses the compressible and survives the incompressible") {
    val quiet = lcg(3, 4000, 64) // small residuals -> rice wins big
    val encQ = Flac.encodeFlac(8000, 1, quiet)
    assert(encQ.length < 4000 * 2,
      s"quiet signal should compress below raw PCM, got ${encQ.length}")
    val noise = lcg(7, 4000) // full-range noise: verbatim fallback keeps ~1x
    val encN = Flac.encodeFlac(8000, 1, noise)
    assert(encN.length < 4000 * 2 + 800, s"noise blew up: ${encN.length}")
  }

  test("mono mix matches the WAV-seam convention (dyadic-exact doubles)") {
    val pcm = lcg(5, 400)
    val enc = Flac.encodeFlac(8000, 2, pcm)
    val (rate, ch, bps, mono) = Flac.decodeFlac(enc).get
    assert(rate == 8000 && ch == 2 && bps == 16 && mono.length == 400)
    // same frame on both channels -> mix == sample/32768 exactly
    pcm.indices.foreach { i =>
      assert(math.round(mono(i) * 32768) == pcm(i).toLong)
    }
  }

  /** Hand-build a one-frame stream with full control over the subframe
    * bits (the decoder-only surface). Returns the complete stream.
    */
  private def handStream(blockSize: Int, channels: Int, chAsgn: Int)(
      writeSubframes: BitWriter => Unit): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    val si = new BitWriter
    si.writeBits(blockSize.toLong, 16); si.writeBits(blockSize.toLong, 16)
    si.writeBits(0L, 24); si.writeBits(0L, 24)
    si.writeBits(8000L, 20)
    si.writeBits((channels - 1).toLong, 3)
    si.writeBits(15L, 5)
    si.writeBits(blockSize.toLong, 36)
    si.writeBits(0L, 64); si.writeBits(0L, 64)
    val sib = si.toBytes
    out.write(0x80); out.write(0); out.write(0); out.write(sib.length)
    out.write(sib, 0, sib.length)
    val w = new BitWriter
    w.writeBits(0x3ffe, 14); w.writeBits(0L, 1); w.writeBits(0L, 1)
    w.writeBits(7L, 4) // explicit 16-bit block size
    w.writeBits(0L, 4) // rate from streaminfo
    w.writeBits(chAsgn.toLong, 4)
    w.writeBits(4L, 3) // 16-bit samples
    w.writeBits(0L, 1)
    w.writeBits(0L, 8) // utf8 frame number 0
    w.writeBits((blockSize - 1).toLong, 16)
    val hdr = w.toBytes
    val frame = new java.io.ByteArrayOutputStream()
    frame.write(hdr, 0, hdr.length)
    frame.write(Flac.crc8(hdr, 0, hdr.length))
    val sw = new BitWriter
    writeSubframes(sw)
    val sub = sw.toBytes
    frame.write(sub, 0, sub.length)
    val fb = frame.toByteArray
    val c16 = Flac.crc16(fb, 0, fb.length)
    frame.write((c16 >> 8) & 0xff); frame.write(c16 & 0xff)
    val all = frame.toByteArray
    out.write(all, 0, all.length)
    out.toByteArray
  }

  private def writeVerbatim(w: BitWriter, xs: Seq[Long], bits: Int): Unit = {
    w.writeBits(0L, 1); w.writeBits(1L, 6); w.writeBits(0L, 1)
    xs.foreach(v => w.writeBits(v & ((1L << bits) - 1), bits))
  }

  test("decoder: LPC subframe (order 2, shifted quantized coefficients)") {
    // x[i] = res[i] + ((c0*x[i-1] + c1*x[i-2]) >> shift)
    val warm = Seq(100L, 110L)
    val coefs = Seq(3L, -1L) // precision 4, shift 1 -> pred = (3a - b) >> 1
    val res = Seq(5L, -2L, 0L, 7L)
    val n = warm.length + res.length
    val stream = handStream(n, 1, 0) { w =>
      w.writeBits(0L, 1)
      w.writeBits(0x20L | 1L, 6) // LPC, order = 1+1 = 2
      w.writeBits(0L, 1)
      warm.foreach(v => w.writeBits(v & 0xffff, 16))
      w.writeBits(3L, 4) // precision-1 = 3 -> 4-bit coefs
      w.writeBits(1L, 5) // shift 1
      coefs.foreach(c => w.writeBits(c & 0xf, 4))
      w.writeBits(0L, 2); w.writeBits(0L, 4) // rice4, partition order 0
      w.writeBits(2L, 4) // rice param 2
      res.foreach { v =>
        val u = if (v >= 0) v << 1 else ((-v) << 1) - 1
        var q = (u >>> 2).toInt
        while (q > 0) { w.writeBits(0L, 1); q -= 1 }
        w.writeBits(1L, 1)
        w.writeBits(u & 3, 2)
      }
    }
    val got = Flac.decodeFlacPcm(stream).get.samples(0)
    val exp = scala.collection.mutable.ArrayBuffer(warm: _*)
    res.foreach { rv =>
      val p = (3 * exp(exp.length - 1) - exp(exp.length - 2)) >> 1
      exp += rv + p
    }
    assert(got.toSeq == exp.map(_.toInt).toSeq)
  }

  test("decoder: rice escape partitions and wasted bits") {
    // verbatim-equivalent through the escape path: fixed order 0, residual
    // written raw at 6 bits; plus wasted-bits flag shifting samples by 2
    val vals = Seq(-20L, 31L, 0L, -32L, 5L, 1L, 2L, 3L)
    val stream = handStream(vals.length, 1, 0) { w =>
      w.writeBits(0L, 1)
      w.writeBits(8L, 6) // fixed order 0
      w.writeBits(1L, 1) // wasted bits flag
      w.writeBits(0L, 1); w.writeBits(1L, 1) // unary 1 -> wasted = 2
      w.writeBits(0L, 2); w.writeBits(0L, 4) // rice4, one partition
      w.writeBits(0xfL, 4) // escape
      w.writeBits(6L, 5) // 6 raw bits per sample
      vals.foreach(v => w.writeBits(v & 0x3f, 6))
    }
    val got = Flac.decodeFlacPcm(stream).get.samples(0)
    assert(got.toSeq == vals.map(v => (v << 2).toInt))
  }

  test("decoder: left/side, right/side and mid/side stereo reconstruction") {
    val left = Seq(1000L, -500L, 32767L, -32768L, 7L)
    val right = Seq(900L, -600L, 32760L, -32768L, -7L)
    val n = left.length
    // left/side (chAsgn 8): ch0 = left @16, ch1 = side = L-R @17
    val ls = handStream(n, 2, 8) { w =>
      writeVerbatim(w, left, 16)
      writeVerbatim(w, left.zip(right).map { case (l, r) => l - r }, 17)
    }
    val dls = Flac.decodeFlacPcm(ls).get
    assert(dls.samples(0).toSeq == left.map(_.toInt))
    assert(dls.samples(1).toSeq == right.map(_.toInt))
    // side/right (chAsgn 9): ch0 = side @17, ch1 = right @16
    val sr = handStream(n, 2, 9) { w =>
      writeVerbatim(w, left.zip(right).map { case (l, r) => l - r }, 17)
      writeVerbatim(w, right, 16)
    }
    val dsr = Flac.decodeFlacPcm(sr).get
    assert(dsr.samples(0).toSeq == left.map(_.toInt))
    assert(dsr.samples(1).toSeq == right.map(_.toInt))
    // mid/side (chAsgn 10): mid = (L+R)>>1 @16, side = L-R @17
    val ms = handStream(n, 2, 10) { w =>
      writeVerbatim(w, left.zip(right).map { case (l, r) => (l + r) >> 1 }, 16)
      writeVerbatim(w, left.zip(right).map { case (l, r) => l - r }, 17)
    }
    val dms = Flac.decodeFlacPcm(ms).get
    assert(dms.samples(0).toSeq == left.map(_.toInt))
    assert(dms.samples(1).toSeq == right.map(_.toInt))
  }

  test("corrupt CRC is rejected; truncation keeps prior frames; garbage is None") {
    val pcm = lcg(9, 600)
    val enc = Flac.encodeFlac(8000, 1, pcm, blockSize = 256) // 3 frames
    // flip a bit in the LAST frame's payload: frames 1-2 must survive
    val bad = enc.clone()
    bad(bad.length - 5) = (bad(bad.length - 5) ^ 0x10).toByte
    val dec = Flac.decodeFlacPcm(bad).get
    assert(dec.samples(0).length == 512,
      s"expected the two clean frames, got ${dec.samples(0).length}")
    assert(dec.samples(0).toSeq == pcm.take(512).map(_.toInt).toSeq)
    // truncate mid-frame: same contract
    val trunc = enc.take(enc.length - 40)
    val dt = Flac.decodeFlacPcm(trunc).get
    assert(dt.samples(0).length % 256 == 0 && dt.samples(0).length >= 256)
    // garbage header
    assert(Flac.decodeFlacPcm("not a flac stream at all".getBytes).isEmpty)
    assert(Flac.decodeFlacPcm(Array.emptyByteArray).isEmpty)
  }

  test("utf8-coded frame numbers roundtrip across all 1-7 byte tiers") {
    // round-9 advice: the encoder used to stop at the 4-byte tier and
    // spill v>>18 into the length-prefix bits for frameNo >= 2^21 —
    // reachable at ~33.5M samples with blockSize=16 — emitting a stream
    // any spec decoder misparses. Pin the full tier table boundary values.
    val vals = Seq(0L, 1L, 0x7fL, 0x80L, 0x7ffL, 0x800L, 0xffffL, 0x10000L,
      0x1fffffL, 0x200000L, 0x3ffffffL, 0x4000000L, 0x7fffffffL,
      0x80000000L, (1L << 36) - 1)
    for (v <- vals) {
      val w = new BitWriter
      Flac.writeUtf8Number(w, v)
      val r = new BitReader(w.toBytes, 0)
      assert(Flac.readUtf8Number(r) == v, s"roundtrip failed for $v")
    }
    // out of the 36-bit budget: loud failure, not silent corruption
    intercept[IllegalArgumentException] {
      Flac.writeUtf8Number(new BitWriter, 1L << 36)
    }
  }

  test("bit io: signed reads, unary, alignment") {
    val w = new BitWriter
    w.writeBits(-5L & 0x3f, 6)
    w.writeUnary(3)
    w.writeBits(0x1a5L, 9)
    val r = new BitReader(w.toBytes, 0)
    assert(r.readSigned(6) == -5L)
    assert(r.readUnary() == 3)
    assert(r.readBits(9) == 0x1a5L)
  }
}
