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

  test("animated GIF: encodeGifAnim -> gifFrames round-trips every frame") {
    val (w, h) = (16, 12)
    val frames = (0 until 4).map(f =>
      Array.tabulate(w * h)(i => ((i * 7 + f * 13 + 3) % 64).toByte))
    val bytes = Multimodal.encodeGifAnim(w, h, frames, palette64)
    val got = Multimodal.gifFrames(bytes)
    assert(got.size == 4)
    for (f <- 0 until 4; i <- 0 until w * h) {
      val rgb = palette64(frames(f)(i) & 0xff)
      val o = i * 3
      val px = ((got(f).pixels(o) & 0xff) << 16) |
        ((got(f).pixels(o + 1) & 0xff) << 8) | (got(f).pixels(o + 2) & 0xff)
      assert(px == rgb, s"frame $f pixel $i")
    }
  }

  test("animated GIF frames agree with ImageIO's frame reader") {
    System.setProperty("java.awt.headless", "true")
    val (w, h) = (9, 7)
    val frames = (0 until 3).map(f =>
      Array.tabulate(w * h)(i => ((i * 11 + f * 29) % 64).toByte))
    val bytes = Multimodal.encodeGifAnim(w, h, frames, palette64)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getNumImages(true) == 3)
    for (f <- 0 until 3) {
      val im = reader.read(f)
      for (i <- Seq(0, w * h / 2, w * h - 1)) {
        assert((im.getRGB(i % w, i / w) & 0xffffff) == palette64(frames(f)(i) & 0xff),
          s"frame $f pixel $i")
      }
    }
  }

  test("partial-rect second frame composites onto the prior canvas") {
    // hand-build: full first frame, then a 2x2 block at (1,1) drawing
    // palette index 5 — gifFrames must keep the untouched pixels
    val (w, h) = (4, 4)
    val f0 = Array.tabulate(w * h)(i => (i % 16).toByte)
    val full = Multimodal.encodeGifAnim(w, h, Seq(f0), palette64)
    // splice a second image block before the trailer
    val block = new java.io.ByteArrayOutputStream()
    val f1 = Array.fill(4)(5.toByte) // 2x2 all index 5
    block.write(0x2c)
    def le16(v: Int): Unit = { block.write(v & 0xff); block.write((v >> 8) & 0xff) }
    le16(1); le16(1); le16(2); le16(2); block.write(0)
    block.write(6) // min code size matching the 64-colour table
    val m = classOf[Multimodal.type].getDeclaredMethod("lzwEncode",
      classOf[Array[Byte]], classOf[Int])
    m.setAccessible(true)
    val data = m.invoke(Multimodal, f1, Integer.valueOf(6)).asInstanceOf[Array[Byte]]
    block.write(data.length); block.write(data, 0, data.length); block.write(0)
    val spliced = full.dropRight(1) ++ block.toByteArray ++ Array(0x3b.toByte)
    val got = Multimodal.gifFrames(spliced)
    assert(got.size == 2)
    val fr = got(1)
    for (y <- 0 until h; x <- 0 until w) {
      val expectIdx = if (x >= 1 && x <= 2 && y >= 1 && y <= 2) 5 else f0(y * w + x) & 0xff
      val o = (y * w + x) * 3
      val px = ((fr.pixels(o) & 0xff) << 16) |
        ((fr.pixels(o + 1) & 0xff) << 8) | (fr.pixels(o + 2) & 0xff)
      assert(px == palette64(expectIdx), s"($x,$y)")
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
