package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Multimodal

/** GIF LZW codec pins: self round-trip, BOTH cross-checks against the
  * JRE's independent ImageIO GIF codec (our encode -> ImageIO decode and
  * ImageIO encode -> our decode), and a large patterned image that forces
  * code-width growth to 12 bits plus a mid-stream dictionary clear.
  */
class GifCodecSpec extends AnyFunSuite {

  private def palette64: Array[Int] =
    Array.tabulate(64)(c => ((c * 37) % 256 << 16) | ((c * 101) % 256 << 8) | ((c * 193) % 256))

  private def decode(bytes: Array[Byte]) = Multimodal.decodeGif(bytes)

  test("encodeGif -> decodeGif round-trips pixel-exactly") {
    val (w, h) = (16, 12)
    val idx = Array.tabulate(w * h)(i => ((i * 7 + 3) % 64).toByte)
    val img = decode(Multimodal.encodeGif(w, h, idx, palette64)).get
    assert(img.width == w && img.height == h && img.channels == 3)
    for (i <- 0 until w * h) {
      val rgb = palette64(idx(i) & 0xff)
      assert((img.pixels(i * 3) & 0xff) == ((rgb >> 16) & 0xff), s"r at $i")
      assert((img.pixels(i * 3 + 1) & 0xff) == ((rgb >> 8) & 0xff), s"g at $i")
      assert((img.pixels(i * 3 + 2) & 0xff) == (rgb & 0xff), s"b at $i")
    }
  }

  test("our encode decodes identically under ImageIO (independent codec)") {
    System.setProperty("java.awt.headless", "true")
    val (w, h) = (23, 17) // non-multiples-of-8 exercise partial final bits
    val idx = Array.tabulate(w * h)(i => ((i * 31 + i / w * 5) % 64).toByte)
    val bytes = Multimodal.encodeGif(w, h, idx, palette64)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = palette64(idx(y * w + x) & 0xff)
      assert((img.getRGB(x, y) & 0xffffff) == rgb, s"pixel ($x,$y)")
    }
  }

  test("ImageIO-written GIF decodes identically under decodeGif") {
    System.setProperty("java.awt.headless", "true")
    val (w, h) = (31, 19)
    val src = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      src.setRGB(x, y, ((x * 53 + y * 11) % 4 match {
        case 0 => 0x000000; case 1 => 0xff0000; case 2 => 0x00ff00; case _ => 0x0000ff
      }))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "gif", bos))
    val img = decode(bos.toByteArray).get
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      val got = ((img.pixels(o) & 0xff) << 16) |
        ((img.pixels(o + 1) & 0xff) << 8) | (img.pixels(o + 2) & 0xff)
      assert(got == (src.getRGB(x, y) & 0xffffff), s"pixel ($x,$y)")
    }
  }

  test("large image forces 12-bit codes + dictionary clear and survives") {
    val (w, h) = (256, 128)
    // low-repetition pattern so the dictionary actually fills to 4096
    val idx = Array.tabulate(w * h)(i => ((i * 2654435761L >>> 8) % 64).toByte)
    val bytes = Multimodal.encodeGif(w, h, idx, palette64)
    val img = decode(bytes).get
    assert(img.width == w && img.height == h)
    var ok = 0
    for (i <- 0 until w * h) {
      val rgb = palette64(idx(i) & 0xff)
      if ((img.pixels(i * 3) & 0xff) == ((rgb >> 16) & 0xff) &&
        (img.pixels(i * 3 + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (img.pixels(i * 3 + 2) & 0xff) == (rgb & 0xff)) ok += 1
    }
    assert(ok == w * h)
    // and ImageIO agrees on the same stream
    System.setProperty("java.awt.headless", "true")
    val ii = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (i <- Seq(0, 777, w * h - 1)) {
      val (x, y) = (i % w, i / w)
      assert((ii.getRGB(x, y) & 0xffffff) == palette64(idx(i) & 0xff))
    }
  }

  test("decodePixels dispatches GIF magic; corrupt stream drops to None") {
    val idx = Array.tabulate(64)(i => (i % 64).toByte)
    val bytes = Multimodal.encodeGif(8, 8, idx, palette64)
    assert(Multimodal.decodePixels(bytes).isDefined)
    val truncated = java.util.Arrays.copyOfRange(bytes, 0, bytes.length / 2)
    assert(Multimodal.decodePixels(truncated).isEmpty)
    bytes(30) = 0x7f.toByte // scribble inside the colour table region is fine
    assert(Multimodal.decodePixels(java.util.Arrays.copyOfRange(bytes, 0, 12)).isEmpty)
  }
}
