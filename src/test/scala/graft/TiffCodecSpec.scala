package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Multimodal

/** Baseline-TIFF codec pins: self round-trip and both cross-checks
  * against the JDK's independent ImageIO TIFF plugin (which writes
  * big-endian MM streams, exercising the byte-order branch our encoder
  * never produces).
  */
class TiffCodecSpec extends AnyFunSuite {

  test("encodeTiff -> decodeTiff round-trips pixel-exactly") {
    val (w, h) = (17, 11)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 256).toByte)
    val img = Multimodal.decodeTiff(Multimodal.encodeTiff(w, h, rgb)).get
    assert(img.width == w && img.height == h && img.channels == 3)
    assert(img.pixels.sameElements(rgb))
  }

  test("our encode decodes identically under ImageIO") {
    System.setProperty("java.awt.headless", "true")
    val (w, h) = (23, 9)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 53 + 11) % 256).toByte)
    val bytes = Multimodal.encodeTiff(w, h, rgb)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val want = ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) | (rgb(o + 2) & 0xff)
      assert((img.getRGB(x, y) & 0xffffff) == want, s"($x,$y)")
    }
  }

  test("ImageIO-written TIFF (MM order) decodes identically under decodeTiff") {
    System.setProperty("java.awt.headless", "true")
    val (w, h) = (19, 13)
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      src.setRGB(x, y, ((x * 37 + y * 101) % 256 << 16) | ((x * 7) % 256 << 8) | (y * 11) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "tiff", bos))
    val img = Multimodal.decodeTiff(bos.toByteArray).get
    assert(img.width == w && img.height == h && img.channels == 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val got = ((img.pixels(o) & 0xff) << 16) |
        ((img.pixels(o + 1) & 0xff) << 8) | (img.pixels(o + 2) & 0xff)
      assert(got == (src.getRGB(x, y) & 0xffffff), s"($x,$y)")
    }
  }

  test("decodePixels dispatches TIFF magic; truncated stream drops to None") {
    val rgb = Array.tabulate(8 * 8 * 3)(i => (i % 256).toByte)
    val bytes = Multimodal.encodeTiff(8, 8, rgb)
    assert(Multimodal.decodePixels(bytes).exists(_.channels == 3))
    assert(Multimodal.decodePixels(
      java.util.Arrays.copyOfRange(bytes, 0, bytes.length / 3)).isEmpty)
  }
}
