package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Multimodal

/** Randomized round-trip properties for the GIF-LZW and baseline-TIFF
  * codecs: arbitrary dimensions (including 1-pixel edges and widths
  * that stress the LSB-first partial-byte packing) and arbitrary
  * content (worst-case incompressible noise and best-case constant
  * runs, which exercise long LZW chains and the KwKwK path). Seeded
  * sampling, reproducible runs — same harness as PropertySpec.
  */
class CodecPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(246813579L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val palette = Array.tabulate(64)(c =>
    ((c * 37) % 256 << 16) | ((c * 101) % 256 << 8) | ((c * 193) % 256))

  private val dimGen = for {
    w <- Gen.choose(1, 48)
    h <- Gen.choose(1, 32)
    mode <- Gen.oneOf(0, 1, 2) // noise, constant, striped
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (w, h, mode, seed)

  test("GIF: arbitrary images round-trip pixel-exactly through LZW") {
    forAll(dimGen) { case (w, h, mode, seed) =>
      val rnd = new scala.util.Random(seed)
      val idx = Array.tabulate(w * h)(i => (mode match {
        case 0 => rnd.nextInt(64)
        case 1 => (seed % 64).toInt.abs
        case _ => (i / math.max(1, w / 3)) % 64
      }).toByte)
      val img = Multimodal.decodeGif(Multimodal.encodeGif(w, h, idx, palette))
        .getOrElse(fail(s"decode failed for ${w}x$h mode $mode"))
      assert(img.width == w && img.height == h)
      var i = 0
      while (i < w * h) {
        val rgb = palette(idx(i) & 0xff)
        assert((img.pixels(i * 3) & 0xff) == ((rgb >> 16) & 0xff) &&
          (img.pixels(i * 3 + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
          (img.pixels(i * 3 + 2) & 0xff) == (rgb & 0xff),
          s"${w}x$h mode $mode pixel $i")
        i += 1
      }
    }
  }

  test("TIFF: arbitrary rasters round-trip byte-exactly") {
    forAll(dimGen) { case (w, h, mode, seed) =>
      val rnd = new scala.util.Random(seed)
      val rgb = Array.tabulate(w * h * 3)(i => (mode match {
        case 0 => rnd.nextInt(256)
        case 1 => (seed % 256).toInt.abs
        case _ => (i * 7) % 256
      }).toByte)
      val img = Multimodal.decodeTiff(Multimodal.encodeTiff(w, h, rgb))
        .getOrElse(fail(s"decode failed for ${w}x$h mode $mode"))
      assert(img.width == w && img.height == h && img.channels == 3)
      assert(img.pixels.sameElements(rgb), s"${w}x$h mode $mode")
    }
  }

  test("GIF animation: arbitrary multi-frame streams round-trip per frame") {
    val gen = for {
      w <- Gen.choose(2, 24)
      h <- Gen.choose(2, 16)
      nf <- Gen.choose(1, 5)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (w, h, nf, seed)
    forAll(gen, n = 30) { case (w, h, nf, seed) =>
      val rnd = new scala.util.Random(seed)
      val frames = (0 until nf).map(_ => Array.fill(w * h)(rnd.nextInt(64).toByte))
      val got = Multimodal.gifFrames(Multimodal.encodeGifAnim(w, h, frames, palette))
      assert(got.size == nf, s"${w}x$h nf=$nf")
      for (f <- 0 until nf; i <- 0 until w * h) {
        val rgb = palette(frames(f)(i) & 0xff)
        val o = i * 3
        assert((((got(f).pixels(o) & 0xff) << 16) | ((got(f).pixels(o + 1) & 0xff) << 8)
          | (got(f).pixels(o + 2) & 0xff)) == rgb, s"frame $f pixel $i")
      }
    }
  }
  private val flacGen = for {
    n <- Gen.choose(0, 3000)
    blockSize <- Gen.oneOf(16, 17, 64, 192, 256, 576, 1024, 4096)
    channels <- Gen.choose(1, 4)
    mode <- Gen.oneOf(0, 1, 2, 3) // noise, constant, ramp, quiet
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (n, blockSize, channels, mode, seed)

  test("FLAC: arbitrary PCM round-trips losslessly at any block size") {
    forAll(flacGen) { case (n, blockSize, channels, mode, seed) =>
      val rnd = new scala.util.Random(seed)
      val body: Array[Short] = mode match {
        case 0 => Array.fill(n)(rnd.nextInt(65536).toShort)
        case 1 => Array.fill(n)(rnd.nextInt(65536).toShort) match {
          case a if a.nonEmpty => Array.fill(n)(a(0)) // constant signal
          case a => a
        }
        case 2 => Array.tabulate(n)(i => ((i * 7 + rnd.nextInt(3)) - n).toShort)
        case _ => Array.fill(n)((rnd.nextInt(256) - 128).toShort)
      }
      val enc = graft.streaming.Flac.encodeFlac(8000, channels, body, blockSize)
      val dec = graft.streaming.Flac.decodeFlacPcm(enc)
        .getOrElse(fail(s"decode failed n=$n bs=$blockSize ch=$channels mode=$mode"))
      assert(dec.channels == channels && dec.bps == 16)
      (0 until channels).foreach { c =>
        assert(dec.samples(c).toSeq == body.map(_.toInt).toSeq,
          s"lossless violated n=$n bs=$blockSize ch=$channels mode=$mode seed=$seed")
      }
    }
  }

  test("FLAC: random prefix truncation never throws and yields whole frames") {
    forAll(Gen.zip(Gen.choose(100, 2000), Gen.choose(0L, Long.MaxValue)), n = 40) {
      case (n, seed) =>
        val rnd = new scala.util.Random(seed)
        val pcm = Array.fill(n)(rnd.nextInt(65536).toShort)
        val enc = graft.streaming.Flac.encodeFlac(8000, 1, pcm, blockSize = 64)
        val cut = rnd.nextInt(enc.length + 1)
        graft.streaming.Flac.decodeFlacPcm(enc.take(cut)).foreach { a =>
          val got = a.samples(0).length
          assert(got % 64 == 0 || got == n,
            s"partial decode not frame-aligned: $got of $n (cut=$cut)")
          assert(a.samples(0).toSeq == pcm.take(got).map(_.toInt).toSeq)
        }
    }
  }

}
