package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Multimodal

/** Golden-value decode tests for the headerless AVI DIB frame paths
  * (BI_RGB raw and BI_RLE8): fixtures are hand-built RIFF trees with a
  * full `hdrl → strl → strh/strf` header, so the decoder is checked
  * against the public AVI/BMP layout, not against itself. (The WAV PCM
  * sine golden lives in OpsSpec; MJPEG-vs-ImageIO in PropertySpec.)
  */
class AviDibDecodeSpec extends AnyFunSuite {

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = body.length & 1
    val buf = java.nio.ByteBuffer.allocate(8 + body.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
    buf.array()
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("LIST".getBytes("US-ASCII")).putInt(4 + body.length)
      .put(listType.getBytes("US-ASCII")).put(body)
    buf.array()
  }

  /** AVI with one `vids` stream of the given BITMAPINFOHEADER fields and
    * the frames as `00dc`/`00db` chunks in `movi`. Palette entries are
    * (R, G, B) triples, serialized as on-disk RGBQUADs (B, G, R, 0).
    */
  private def buildDibAvi(w: Int, h: Int, bpp: Int, compression: Int,
      palette: Seq[(Int, Int, Int)], frames: Seq[Array[Byte]],
      frameId: String): Array[Byte] = {
    val strh = java.nio.ByteBuffer.allocate(56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes("US-ASCII")).put("DIB ".getBytes("US-ASCII"))
    // remaining strh fields are irrelevant to the format walk; zeros
    val strf = java.nio.ByteBuffer.allocate(40 + palette.length * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(bpp.toShort)
      .putInt(compression).putInt(0).putInt(0).putInt(0)
      .putInt(palette.length).putInt(0)
    palette.foreach { case (r, g, b) =>
      strf.put(b.toByte).put(g.toByte).put(r.toByte).put(0.toByte)
    }
    val avih = new Array[Byte](56) // contents unused by the format walk
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val movi = list("movi", frames.flatMap(f => chunk(frameId, f)).toArray)
    val body = hdrl ++ movi
    val buf = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    buf.array()
  }

  test("BI_RLE8 AVI frame decodes run, absolute, EOL and EOF opcodes to exact pixels") {
    val palette = Seq((10, 20, 30), (200, 0, 0), (0, 150, 0), (0, 0, 250))
    // 5×2, bottom-up. Bottom raster row: run 2×idx1, absolute [2,3,2]
    // (odd count → pad byte), EOL. Top raster row: run 5×idx3, EOF.
    val rle = Array[Int](
      2, 1, 0, 3, 2, 3, 2, 0, // run + absolute(3) + pad
      0, 0, // end of line
      5, 3, // run 5×idx3
      0, 1 // end of bitmap
    ).map(_.toByte)
    val avi = buildDibAvi(5, 2, 8, 1, palette, Seq(rle), "00dc")
    val fmt = Multimodal.aviStreamFormat(avi).get
    assert(fmt.width == 5 && fmt.height == 2 && fmt.bitCount == 8 &&
      fmt.compression == 1 && !fmt.topDown)
    assert(fmt.palette.toSeq == palette.flatMap { case (r, g, b) =>
      Seq(r.toByte, g.toByte, b.toByte) })
    val imgs = Multimodal.aviFramePixels(avi)
    assert(imgs.length == 1)
    val img = imgs.head
    assert(img.width == 5 && img.height == 2 && img.channels == 3)
    def px(x: Int, y: Int): (Int, Int, Int) = {
      val o = (y * img.width + x) * 3
      ((img.pixels(o) & 0xff), (img.pixels(o + 1) & 0xff), (img.pixels(o + 2) & 0xff))
    }
    // displayed top row (y=0) is the LAST raster row: 5×idx3
    (0 until 5).foreach(x => assert(px(x, 0) == palette(3), s"top x=$x"))
    // displayed bottom row: idx 1,1,2,3,2
    assert(Seq(px(0, 1), px(1, 1), px(2, 1), px(3, 1), px(4, 1)) ==
      Seq(palette(1), palette(1), palette(2), palette(3), palette(2)))
  }

  test("BI_RGB raw-DIB AVI frame decodes bottom-up padded BGR rows exactly") {
    val w = 3; val h = 2
    val stride = ((w * 3 + 3) / 4) * 4 // 12: 3 pad bytes per row
    // displayed pixel grid (RGB): top row R,G,B; bottom row W,K,Y
    val top = Seq((255, 0, 0), (0, 255, 0), (0, 0, 255))
    val bottom = Seq((255, 255, 255), (0, 0, 0), (255, 255, 0))
    val payload = new Array[Byte](stride * h)
    def putRow(rasterRow: Int, colors: Seq[(Int, Int, Int)]): Unit =
      colors.zipWithIndex.foreach { case ((r, g, b), x) =>
        val o = rasterRow * stride + x * 3
        payload(o) = b.toByte; payload(o + 1) = g.toByte; payload(o + 2) = r.toByte
      }
    putRow(0, bottom) // raster row 0 = displayed BOTTOM (bottom-up DIB)
    putRow(1, top)
    val avi = buildDibAvi(w, h, 24, 0, Nil, Seq(payload), "00db")
    val imgs = Multimodal.aviFramePixels(avi)
    assert(imgs.length == 1)
    val img = imgs.head
    assert(img.width == w && img.height == h && img.channels == 3)
    val got = for (y <- 0 until h; x <- 0 until w) yield {
      val o = (y * w + x) * 3
      ((img.pixels(o) & 0xff), (img.pixels(o + 1) & 0xff), (img.pixels(o + 2) & 0xff))
    }
    assert(got == top ++ bottom)
  }

  test("corrupt DIB payloads drop instead of throwing or hanging") {
    val palette = Seq((1, 2, 3))
    // RLE payload that never emits EOF and overruns: must terminate, and a
    // truncated raw frame must return None
    val rle = Array[Int](255, 0, 255, 0, 255, 0).map(_.toByte)
    val avi = buildDibAvi(4, 4, 8, 1, palette, Seq(rle), "00dc")
    assert(Multimodal.aviFramePixels(avi).length == 1) // bounded decode, padded zeros
    val truncated = buildDibAvi(8, 8, 24, 0, Nil, Seq(new Array[Byte](10)), "00db")
    assert(Multimodal.aviFramePixels(truncated).isEmpty)
  }
}
