package graft

import java.net.{DatagramPacket, DatagramSocket, InetAddress}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.streaming.{MediaRecord, Multimodal}

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val large = (1 to 1000).map(i => (i % 7, i)).toDF("k", "v")
    val small = Seq((0, "a"), (1, "b"), (3, "c")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, small, "k", saltFactor = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == plain.size)
  }

  test("salted join tolerates unhashable (map) columns on the large side") {
    // the content-hash salt must skip MapType columns — xxhash64 rejects
    // them at analysis time, and a properties/tags map next to the join
    // key is a common fact-table shape
    import org.apache.spark.sql.functions.{col, map, lit}
    val large = (1 to 100).map(i => (i % 5, i)).toDF("k", "v")
      .withColumn("props", map(lit("a"), col("v")))
    val small = Seq((0, "x"), (2, "y")).toDF("k", "name")
    val plain = large.select("k", "v").join(small, Seq("k"))
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, small, "k", saltFactor = 4)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def records = Seq(
    MediaRecord(1L, "image", Array.tabulate[Byte](1000)(i => (i % 251).toByte), Map("src" -> "a")),
    MediaRecord(2L, "audio", Array.tabulate[Byte](64)(i => (i * 3).toByte), Map.empty)).toDS()

  test("partition-wise decode produces deterministic features + histogram") {
    val feats = Multimodal.decodeFeatures(records).collect().sortBy(_.id)
    assert(feats.map(_.byteLen).toSeq == Seq(1000, 64))
    assert(feats(0).width == 1000 % 640 && feats(0).height == (1000 * 7) % 480)
    assert(feats.forall(f => math.abs(f.byteHistogram.sum - 1.0) < 1e-9))
    assert(feats(0).contentHash.length == 32)
    // determinism: same input, same features
    val again = Multimodal.decodeFeatures(records).collect().sortBy(_.id)
    assert(again.map(_.contentHash).toSeq == feats.map(_.contentHash).toSeq)
  }

  test("frame sampling explodes every Nth frame with byte slices") {
    val frames = Multimodal.frameSample(records, everyN = 2).collect()
    val byId = frames.groupBy(_.id)
    // id=1: 1000 % 30 + 1 = 11 frames -> sampled 0,2,4,6,8,10 = 6
    assert(byId(1L).length == 6)
    assert(byId(1L).forall(_.frameBytes.nonEmpty))
  }

  test("uncompressed formats decode REAL dimensions (PPM P6, BMP)") {
    // P6 PPM: 3x2 image, raw RGB payload
    val ppm = ("P6\n3 2\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](3 * 2 * 3)(7))
    // minimal BMP header: 'BM', width=640 at offset 18 LE, height=-480
    // (top-down) at offset 22
    val bmp = new Array[Byte](64)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(18) = 0x80.toByte; bmp(19) = 0x02 // 640
    val hBytes = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-480).array()
    System.arraycopy(hBytes, 0, bmp, 22, 4)
    val ds = Seq(
      MediaRecord(10L, "image", ppm, Map.empty),
      MediaRecord(11L, "image", bmp, Map.empty)).toDS()
    val feats = Multimodal.decodeFeatures(ds).collect().sortBy(_.id)
    assert(feats(0).width == 3 && feats(0).height == 2 && feats(0).nFrames == 1)
    assert(feats(1).width == 640 && feats(1).height == 480 && feats(1).nFrames == 1)
  }

  test("compressed still formats decode REAL dimensions from headers (PNG, JPEG)") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG: signature + IHDR chunk, width 800 / height 600 big-endian
    val png = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x03, 0x20, // width 800
      0, 0, 0x02, 0x58, // height 600
      8, 6, 0, 0, 0)
    // JPEG: SOI, APP0/JFIF (skipped via its length), SOF2 progressive
    // frame header (height 256, width 320), SOS, EOI
    val jpg = b(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0,
      0xff, 0xc2, 0x00, 0x11, 8, 0x01, 0x00, 0x01, 0x40,
      3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1,
      0xff, 0xda, 0x00, 0x08, 1, 1, 0, 0, 0x3f, 0,
      0xff, 0xd9)
    assert(Multimodal.decodeDims(png).contains((800, 600)))
    assert(Multimodal.decodeDims(jpg).contains((320, 256)))
    val ds = Seq(
      MediaRecord(20L, "image", png, Map.empty),
      MediaRecord(21L, "image", jpg, Map.empty)).toDS()
    val feats = Multimodal.decodeFeatures(ds).collect().sortBy(_.id)
    assert(feats(0).width == 800 && feats(0).height == 600 && feats(0).nFrames == 1)
    assert(feats(1).width == 320 && feats(1).height == 256 && feats(1).nFrames == 1)
  }

  test("video containers probe REAL dims + duration from headers (MP4, AVI)") {
    // MP4: ftyp, then moov { mvhd v0 (timescale 600, duration 3000 ->
    // 5 s), trak { tkhd v0 (width 640, height 360 as 16.16 fixed) } }
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + 108 + 8 + 92)
    bb.putInt(16).put("ftyp".getBytes("US-ASCII")).put("isom".getBytes).putInt(0)
    bb.putInt(8 + 108 + 8 + 92).put("moov".getBytes)
    bb.putInt(108).put("mvhd".getBytes)
    bb.putInt(0) // version 0 + flags
    bb.putInt(0).putInt(0) // creation, modification
    bb.putInt(600).putInt(3000) // timescale, duration
    bb.position(bb.position() + 108 - 8 - 20) // rest of mvhd zeros
    bb.putInt(8 + 92).put("trak".getBytes)
    bb.putInt(92).put("tkhd".getBytes)
    val tkhdPayload = bb.position()
    bb.position(tkhdPayload + 76)
    bb.putInt(640 << 16).putInt(360 << 16)
    val mp4 = bb.array()
    val v1 = Multimodal.probeVideo(mp4).get
    assert(v1 == Multimodal.VideoInfo(640, 360, 0, 5.0))

    // AVI: RIFF 'AVI ' LIST hdrl { avih: 33333 us/frame, 300 frames,
    // 320x240 } -> 9.9999 s
    val ab = java.nio.ByteBuffer.allocate(12 + 12 + 8 + 56)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ab.put("RIFF".getBytes).putInt(12 + 8 + 56 - 8 + 12).put("AVI ".getBytes)
    ab.put("LIST".getBytes).putInt(4 + 8 + 56).put("hdrl".getBytes)
    ab.put("avih".getBytes).putInt(56)
    val avihP = ab.position()
    ab.putInt(33333) // dwMicroSecPerFrame
    ab.position(avihP + 16); ab.putInt(300) // dwTotalFrames
    ab.position(avihP + 32); ab.putInt(320).putInt(240)
    ab.position(avihP + 56)
    val avi = ab.array()
    val v2 = Multimodal.probeVideo(avi).get
    assert(v2.width == 320 && v2.height == 240 && v2.frames == 300)
    assert(math.abs(v2.durationSec - 9.9999) < 1e-6)

    // features pipeline: real container dims ride in, AVI frame count too
    val ds = Seq(
      MediaRecord(30L, "video", mp4, Map.empty),
      MediaRecord(31L, "video", avi, Map.empty)).toDS()
    val feats = Multimodal.decodeFeatures(ds).collect().sortBy(_.id)
    assert(feats(0).width == 640 && feats(0).height == 360 && feats(0).nFrames == 1)
    assert(feats(1).width == 320 && feats(1).height == 240 && feats(1).nFrames == 300)

    // truncated/corrupt containers drop out instead of throwing
    assert(Multimodal.probeVideo(mp4.take(20)).isEmpty)
    assert(Multimodal.probeVideo("RIFF1234AVI x".getBytes).isEmpty)
    assert(Multimodal.probeVideo(Array[Byte](1, 2, 3)).isEmpty)

    // forged 0xFFFFFFFF chunk sizes must terminate, not walk the cursor
    // backwards into an executor-hanging loop (corrupt-length class)
    val evil = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes).putInt(56).put("AVI ".getBytes)
    evil.put("LIST".getBytes).putInt(40).put("hdrl".getBytes)
    evil.put("junk".getBytes).putInt(0xFFFFFFFF) // sz wraps negative as Int
    assert(Multimodal.probeVideo(evil.array()).isEmpty)
    val evil2 = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil2.put("RIFF".getBytes).putInt(56).put("AVI ".getBytes)
    evil2.put("junk".getBytes).putInt(0xFFFFFFFF) // top-level chunk, same
    assert(Multimodal.probeVideo(evil2.array()).isEmpty)
    // forged MP4 largesize past Long range stops cleanly too
    val evil3 = java.nio.ByteBuffer.allocate(48)
    evil3.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
    evil3.putInt(1).put("moov".getBytes).putLong(Long.MaxValue - 3)
    assert(Multimodal.probeVideo(evil3.array()).isEmpty)
  }

  test("decodeFeatures runs unchanged on a STREAM of media records") {
    // the multimodal plumbing is mapPartitions with init-once decode —
    // it must apply to a streaming Dataset as-is (binary assets arrive
    // continuously at ingest; same partition-wise batching)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val png = encodeImageIO(
      { val im = new java.awt.image.BufferedImage(4, 3,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        im.setRGB(1, 1, 0xffffff); im }, "png")
    val mem = MemoryStream[MediaRecord]
    val q = Multimodal.decodeFeatures(mem.toDS())
      .writeStream.format("memory").queryName("mm_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        MediaRecord(1L, "image", png, Map.empty),
        MediaRecord(2L, "video", Array[Byte](1, 2, 3), Map.empty))
      q.processAllAvailable()
      val rows = spark.table("mm_stream").collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Int]("width"))).toMap
      assert(rows(1L) == 4, s"png dims not decoded in-stream: $rows")
      assert(rows.contains(2L), "undecodable record must still flow through")
    } finally q.stop()
  }

  private def encodeImageIO(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    System.setProperty("java.awt.headless", "true")
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  test("PNG pixels decode for real: inflate + unfilter vs an independent encoder") {
    import java.awt.image.BufferedImage
    val rnd = new scala.util.Random(42)
    // RGB: random pixels so every filter type gets exercised
    val rgb = new BufferedImage(37, 23, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 23; x <- 0 until 37)
      rgb.setRGB(x, y, rnd.nextInt(0xffffff))
    val rgbPng = encodeImageIO(rgb, "png")
    val decoded = graft.streaming.Multimodal.decodePixels(rgbPng).get
    assert(decoded.width == 37 && decoded.height == 23 && decoded.channels == 3)
    for (y <- 0 until 23; x <- 0 until 37) {
      val expect = rgb.getRGB(x, y)
      val o = (y * 37 + x) * 3
      assert((decoded.pixels(o) & 0xff) == ((expect >> 16) & 0xff), s"R at $x,$y")
      assert((decoded.pixels(o + 1) & 0xff) == ((expect >> 8) & 0xff), s"G at $x,$y")
      assert((decoded.pixels(o + 2) & 0xff) == (expect & 0xff), s"B at $x,$y")
    }
    // grayscale: colorType 0, one channel
    val gray = new BufferedImage(16, 16, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      gray.getRaster.setSample(x, y, 0, (x * 16 + y) % 256)
    val g = graft.streaming.Multimodal.decodePixels(encodeImageIO(gray, "png")).get
    assert(g.channels == 1)
    assert((g.pixels(0) & 0xff) == 0 && (g.pixels(17) & 0xff) == 17)
    // RGBA: colorType 6, four channels
    val rgba = new BufferedImage(8, 8, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 8; x <- 0 until 8)
      rgba.setRGB(x, y, (x * 32 << 24) | rnd.nextInt(0xffffff))
    val a = graft.streaming.Multimodal.decodePixels(encodeImageIO(rgba, "png")).get
    assert(a.channels == 4 && a.width == 8)
  }

  test("pixelFeatures computes real luminance stats; JPEG rides ImageIO") {
    import java.awt.image.BufferedImage
    // uniform mid-gray PNG: mean luminance 128, stddev 0
    val flat = new BufferedImage(10, 10, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 10; x <- 0 until 10) flat.setRGB(x, y, 0x808080)
    val flatPng = encodeImageIO(flat, "png")
    // PPM twin of the same image
    val ppm = "P6\n10 10\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](300)(0x80.toByte)
    val jpeg = encodeImageIO(flat, "jpg")
    val ds = Seq(
      MediaRecord(1L, "image", flatPng, Map.empty),
      MediaRecord(2L, "image", ppm, Map.empty),
      MediaRecord(3L, "image", jpeg, Map.empty),
      MediaRecord(4L, "audio", Array.fill[Byte](32)(1), Map.empty)).toDS()
    val feats = Multimodal.pixelFeatures(ds).collect().sortBy(_.id)
    assert(feats.map(_.id).toSeq == Seq(1L, 2L, 3L), "undecodable audio drops out")
    feats.foreach { f =>
      assert(f.width == 10 && f.height == 10)
      assert(math.abs(f.lumMean - 128.0) < 2.0, s"mean ${f.lumMean}") // jpeg is lossy
      assert(f.lumStd < 2.0)
      assert(math.abs(f.lumHist.sum - 1.0) < 1e-9)
    }
  }

  test("perceptual hash: stable under brightness shift and resize, separates images") {
    import java.awt.image.BufferedImage
    val rnd = new scala.util.Random(11)
    def gradient(w: Int, h: Int, shift: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = math.min(255, x * 256 / w / 2 + y * 256 / h / 2 + shift)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    val base = gradient(64, 64, 0)
    val bright = gradient(64, 64, 20)
    val resized = gradient(160, 160, 0) // same structure, different resolution
    val noise = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) noise.setRGB(x, y, rnd.nextInt(0xffffff))
    val ds = Seq(
      MediaRecord(1L, "image", encodeImageIO(base, "png"), Map.empty),
      MediaRecord(2L, "image", encodeImageIO(bright, "png"), Map.empty),
      MediaRecord(3L, "image", encodeImageIO(resized, "png"), Map.empty),
      MediaRecord(4L, "image", encodeImageIO(noise, "png"), Map.empty)).toDS()
    val hs = Multimodal.perceptualHashes(ds).collect().map(h => h.id -> h.phash).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(1L), hs(2L)) <= 6, s"brightness shift moved ${ham(hs(1L), hs(2L))} bits")
    assert(ham(hs(1L), hs(3L)) <= 6, s"resize moved ${ham(hs(1L), hs(3L))} bits")
    assert(ham(hs(1L), hs(4L)) >= 16, s"unrelated images too close: ${ham(hs(1L), hs(4L))}")
    // the resize kernel itself: a horizontal gradient pooled to 2x1 has a
    // darker left half than right, and cell means stay within byte range
    val img = graft.streaming.Multimodal.decodePixels(encodeImageIO(base, "png")).get
    val g = graft.streaming.Multimodal.resizeLuma(img, 2, 1)
    assert(g.length == 2 && g(0) < g(1), s"gradient pooled wrong: ${g.toSeq}")
    assert(g.forall(v => v >= 0 && v <= 255))
  }

  private def wav(sampleRate: Int, channels: Int, bps: Int,
      samples: Array[Double]): Array[Byte] = {
    // hand-built RIFF/WAVE so the decoder is checked against the spec,
    // not against itself
    val bytesPerFrame = channels * bps / 8
    val dataLen = samples.length * bytesPerFrame
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * bytesPerFrame).putShort(bytesPerFrame.toShort)
      .putShort(bps.toShort)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach { s =>
      (0 until channels).foreach { _ =>
        if (bps == 16) buf.putShort((s * 32767).toShort)
        else buf.put(((s * 127) + 128).toInt.toByte)
      }
    }
    buf.array()
  }

  test("PCM WAV decodes real audio features: duration, RMS, zero-cross rate") {
    val rate = 8000
    val n = rate / 2 // half a second
    val sine = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 440 * i / rate))
    val mono16 = wav(rate, 1, 16, sine)
    val stereo8 = wav(rate, 2, 8, sine)
    val ds = Seq(
      MediaRecord(1L, "audio", mono16, Map.empty),
      MediaRecord(2L, "audio", stereo8, Map.empty),
      MediaRecord(3L, "audio", Array.fill[Byte](100)(9), Map.empty)).toDS()
    val feats = Multimodal.audioFeatures(ds).collect().sortBy(_.id)
    assert(feats.map(_.id).toSeq == Seq(1L, 2L), "non-WAV payloads drop out")
    val f = feats(0)
    assert(f.sampleRate == rate && f.channels == 1 && f.bitsPerSample == 16)
    assert(math.abs(f.durationSec - 0.5) < 1e-9)
    // sine RMS = amplitude / sqrt(2); zero-cross rate = 2f/rate
    assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 0.01, s"rms ${f.rms}")
    assert(math.abs(f.zeroCrossRate - 2.0 * 440 / rate) < 0.01, s"zcr ${f.zeroCrossRate}")
    assert(math.abs(f.peak - 0.5) < 0.01)
    val g = feats(1)
    assert(g.channels == 2 && g.bitsPerSample == 8)
    assert(math.abs(g.rms - 0.5 / math.sqrt(2)) < 0.05) // 8-bit quantization
  }

  test("IMA ADPCM golden block: hand-derived predictor walk from the spec tables") {
    // one mono block, header predictor 0 / step index 0 (step = 7), one
    // nibble group [4,0,0,0,8,0,0,0]. By the spec arithmetic:
    //   n=4: diff = 7>>3 + 7 = 7        -> pred 7, idx 0+2 = 2 (step 9)
    //   n=0: diff = 9>>3 = 1            -> pred 8, idx 1 (step 8)
    //   n=0: diff = 8>>3 = 1            -> pred 9, idx 0 (step 7)
    //   n=0: diff = 7>>3 = 0            -> pred 9, idx 0
    //   n=8: sign-only, diff 0          -> pred 9, idx 0
    //   n=0 x3                          -> pred 9
    val buf = java.nio.ByteBuffer.allocate(56) // 12 + (8+20) fmt + (8+8) data
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(48).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11).putShort(1).putInt(8000).putInt(4000)
      .putShort(8).putShort(4).putShort(2).putShort(9)
    buf.put("data".getBytes("US-ASCII")).putInt(8)
    buf.putShort(0).put(0.toByte).put(0.toByte) // header: pred 0, idx 0
    buf.put(Array[Byte](0x04, 0x00, 0x08, 0x00)) // nibbles low-first
    val Some((rate, ch, bps, mono)) = Multimodal.decodeWav(buf.array())
    assert(rate == 8000 && ch == 1 && bps == 4)
    val expected = Seq(0, 7, 8, 9, 9, 9, 9, 9, 9).map(_ / 32768.0)
    assert(mono.toSeq == expected, s"got ${mono.toSeq.map(_ * 32768)}")
  }

  test("G.711 mu-law/A-law, float32 and 24-bit PCM WAV decode") {
    def wav(fmtTag: Int, bps: Int, payload: Array[Byte],
        extensible: Boolean = false): Array[Byte] = {
      val fmtLen = if (extensible) 40 else 16
      val buf = java.nio.ByteBuffer
        .allocate(12 + 8 + fmtLen + 8 + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII"))
        .putInt(4 + 8 + fmtLen + 8 + payload.length)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(fmtLen)
        .putShort((if (extensible) 0xfffe else fmtTag).toShort).putShort(1)
        .putInt(8000).putInt(8000 * bps / 8)
        .putShort((bps / 8).toShort).putShort(bps.toShort)
      if (extensible) { // cbSize, validBits, channelMask, GUID code
        buf.putShort(22).putShort(bps.toShort).putInt(0)
        buf.putShort(fmtTag.toShort).put(new Array[Byte](14))
      }
      buf.put("data".getBytes("US-ASCII")).putInt(payload.length).put(payload)
      buf.array()
    }
    // Pin the canonical Sun g711.c expansions directly: 0xFF/0x7F are
    // the two zeros, 0x00/0x80 the extremes (+-32124)
    val Some((_, _, _, mu)) = Multimodal.decodeWav(
      wav(7, 8, Array[Byte](0xff.toByte, 0x7f, 0x00, 0x80.toByte)))
    assert((mu(0) * 32768).round == 0L)   // 0xFF = +0
    assert((mu(1) * 32768).round == 0L)   // 0x7F = -0
    assert((mu(2) * 32768).round == -32124L)
    assert((mu(3) * 32768).round == 32124L)
    val Some((_, _, _, al)) = Multimodal.decodeWav(
      wav(6, 8, Array[Byte](0x55, 0xd5.toByte, 0x2a, 0xaa.toByte)))
    assert((al(0) * 32768).round == -8L)  // 0x55 = -8 (closest to 0)
    assert((al(1) * 32768).round == 8L)
    assert((al(2) * 32768).round == -32256L) // 0x2A ^ 0x55 = 0x7F: extreme
    assert((al(3) * 32768).round == 32256L)
    // float32: exact values through the IEEE path
    val fb = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    fb.putFloat(0.25f).putFloat(-1.0f).putFloat(0.0f)
    val Some((_, _, bpsF, fl)) = Multimodal.decodeWav(wav(3, 32, fb.array()))
    assert(bpsF == 32 && fl.toSeq == Seq(0.25, -1.0, 0.0))
    // 24-bit PCM: sign extension through the third byte
    val p24 = Array[Byte](0, 0, 0x40, 0, 0, 0x80.toByte, -1, -1, -1)
    val Some((_, _, _, s24)) = Multimodal.decodeWav(wav(1, 24, p24))
    assert(s24(0) == 0.5 && s24(1) == -1.0)
    assert(math.abs(s24(2) * 8388608.0 + 1.0) < 1e-9)
    // WAVE_FORMAT_EXTENSIBLE wrapping float32 dispatches on the GUID code
    val Some((_, _, _, ext)) = Multimodal.decodeWav(
      wav(3, 32, fb.array(), extensible = true))
    assert(ext.toSeq == Seq(0.25, -1.0, 0.0))
  }

  test("MS ADPCM golden block: hand-derived predictor walk from the spec tables") {
    // mono block, coeff index 0 (c1=256, c2=0), delta=16, s1=100, s2=50,
    // nibbles [1, -1, 2, -8]. Spec arithmetic:
    //   out: 50, 100 (stored samples, older first)
    //   n=+1: pred = 100 + 16  = 116; delta = max(16, 230*16/256) = 16
    //   n=-1: pred = 116 - 16  = 100; delta = 16
    //   n=+2: pred = 100 + 32  = 132; delta = 16
    //   n=-8: pred = 132 - 128 = 4;   delta = 768*16/256 = 48
    val buf = java.nio.ByteBuffer.allocate(12 + 8 + 16 + 8 + 9)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(33)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(0x02).putShort(1).putInt(8000).putInt(4000)
      .putShort(9).putShort(4)
    buf.put("data".getBytes("US-ASCII")).putInt(9)
    buf.put(0.toByte).putShort(16).putShort(100).putShort(50)
    buf.put(Array[Byte](0x1f, 0x28)) // nibbles high-first: 1,15(-1),2,8(-8)
    val Some((rate, ch, bps, mono)) = Multimodal.decodeWav(buf.array())
    assert(rate == 8000 && ch == 1 && bps == 4)
    val expected = Seq(50, 100, 116, 100, 132, 4).map(_ / 32768.0)
    assert(mono.toSeq == expected, s"got ${mono.toSeq.map(_ * 32768)}")
  }

  test("IMA ADPCM round-trip: encoder/decoder lockstep within step-size error") {
    val rate = 8000
    val n = 2000
    val pcm = Array.tabulate(n)(i =>
      (8000 * math.sin(2 * math.Pi * 440 * i / rate)).toShort)
    val adpcm = Multimodal.encodeWavImaAdpcm(rate, 1, pcm)
    val Some((r2, ch2, bps2, mono)) = Multimodal.decodeWav(adpcm)
    assert(r2 == rate && ch2 == 1 && bps2 == 4)
    assert(mono.length >= n, s"decoded ${mono.length} of $n samples")
    // ADPCM tracks a 440 Hz sine closely once the step adapts: compare
    // decoded to source over the signal body, relative RMS error < 5%
    var err = 0.0
    var sig = 0.0
    (64 until n).foreach { i =>
      val d = mono(i) * 32768 - pcm(i)
      err += d * d; sig += pcm(i).toDouble * pcm(i)
    }
    assert(math.sqrt(err / sig) < 0.05,
      s"relative RMS error ${math.sqrt(err / sig)}")
    // stereo interleave: same frame on both channels must mix to the
    // same mono signal as the mono encode
    val st = Multimodal.encodeWavImaAdpcm(rate, 2, pcm)
    val Some((_, chS, _, monoS)) = Multimodal.decodeWav(st)
    assert(chS == 2)
    assert(monoS.take(n).sameElements(mono.take(n)),
      "stereo mix must equal mono decode for duplicated channels")
    // and audioFeatures consumes ADPCM through the same real path
    val feats = Multimodal.audioFeatures(
      Seq(MediaRecord(9L, "audio", adpcm, Map.empty)).toDS()).collect()
    assert(feats.length == 1 && feats(0).bitsPerSample == 4)
    assert(math.abs(feats(0).rms - 8000.0 / 32768 / math.sqrt(2)) < 0.02)
  }
}

class UdpSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("udp source receives datagram lines into micro-batches") {
    val port = {
      val probe = new DatagramSocket(0)
      val p = probe.getLocalPort
      probe.close(); p
    }
    val df = spark.readStream
      .format("graft.sources.UdpLineSource")
      .option("port", port.toString)
      .load()
    val q = df.writeStream.format("memory").queryName("udp_out")
      .outputMode("append").start()
    try {
      val sender = new DatagramSocket()
      val payload = "alpha,1\nbeta,2\n".getBytes("UTF-8")
      val deadline = System.currentTimeMillis() + 10000
      var rows = Array.empty[org.apache.spark.sql.Row]
      while (rows.length < 2 && System.currentTimeMillis() < deadline) {
        sender.send(new DatagramPacket(payload, payload.length,
          InetAddress.getLoopbackAddress, port))
        Thread.sleep(100)
        q.processAllAvailable()
        rows = spark.table("udp_out").collect()
      }
      sender.close()
      assert(rows.length >= 2, "no datagrams received")
      assert(rows.map(_.getAs[String]("line")).toSet.subsetOf(Set("alpha,1", "beta,2")))
    } finally q.stop()
  }
}

class SocketWriterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stream write-back delivers lines to a TCP peer (K9)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val server = new java.net.ServerSocket(0)
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val acceptor = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        new Thread(() => {
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(sock.getInputStream))
          var l = in.readLine()
          while (l != null) { received.add(l); l = in.readLine() }
        }).start()
      } catch { case _: java.io.IOException => }
    })
    acceptor.setDaemon(true); acceptor.start()

    val mem = MemoryStream[String]
    val q = LineSinks.socketWriter(
      mem.toDS().toDF("line"), "127.0.0.1", server.getLocalPort).start()
    try {
      mem.addData("out1", "out2")
      q.processAllAvailable()
      val deadline = System.currentTimeMillis() + 10000
      while (received.size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(received.toArray.map(_.toString).sorted.toSeq == Seq("out1", "out2"))
    } finally { q.stop(); server.close() }
  }
}

/** PPJoin losslessness on a Zipf-shaped corpus (the data shape the
  * prefix-filter plan exists for): the filtered join must equal an
  * independent brute-force all-pairs Jaccard computed driver-side.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("distributed min-label propagation equals driver union-find") {
    // deterministic random-ish graph: chains, a star, isolated pairs, and
    // cross-links that merge components across id ranges
    val edges = (
      (0L until 40L).map(i => (i, i + 1)) ++          // one long chain
        (100L until 120L).map(i => (100L, i + 1)) ++  // star at 100
        Seq((41L, 100L)) ++                           // chain <-> star merge
        (200L until 240L by 2).map(i => (i, i + 1)) ++ // isolated pairs
        Seq((500L, 300L), (300L, 41L))                // high id folds into 0's comp
      ).toDF("doc_a", "doc_b")
    val exact = graft.operators.TextOps.connectedComponents(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val dist = graft.operators.TextOps.connectedComponents(edges,
        smallGraphMax = 0L) // force the distributed path
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist == exact, s"distributed labeling diverged")
    // chain 0..40 labels to 0; the star/cross-link component {41,
    // 100..121, 300, 500} labels to its min node 41; pairs stay pairs
    assert(exact(40L) == 0L && exact(1L) == 0L)
    assert(exact(500L) == 41L && exact(120L) == 41L && exact(300L) == 41L)
    assert(exact(201L) == 200L)
  }
}

class SpanDupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("spanDupPositions finds maximal duplicated runs; counts agree") {
    import org.apache.spark.sql.functions._
    // doc0/doc1 share the 8-token run "a..h" (4 consecutive dup 5-grams);
    // doc2 is unique; doc3 repeats two isolated 5-grams of that run
    val docs = Seq(
      (0L, "a b c d e f g h i j"),
      (1L, "x x a b c d e f g h y y"),
      (2L, "p q r s t u v w"),
      (3L, "a b c d e z z z z d e f g h"))
      .toDF("doc_id", "text")
      .withColumn("w", graft.operators.TextOps.tokens(col("text")))
    val (g, dp) = graft.operators.TextOps.spanDupPositions(docs, "doc_id", "w", 5)
    assert(g.count() == 4)
    val pos = dp.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(pos == Set((0L, 0), (0L, 1), (0L, 2), (0L, 3),
      (1L, 2), (1L, 3), (1L, 4), (1L, 5), (3L, 0), (3L, 9)))
    // and the count variant agrees with the positional one
    val (_, d) = graft.operators.TextOps.spanDupFrames(docs, "doc_id", "w", 5)
    val counts = d.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(counts == Map(0L -> 4L, 1L -> 4L, 3L -> 2L))
  }
}

class ZipfJaccardSpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("similarityJoinExact equals brute force on a Zipf vocabulary") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 500).map(i => s"w$i")
    // Zipf-ish sampling: rank r with prob ~ 1/r
    val cum = vocab.indices.map(i => 1.0 / (i + 1)).scanLeft(0.0)(_ + _).tail
    val total = cum.last
    def word(): String = {
      val x = rnd.nextDouble() * total
      vocab(cum.indexWhere(_ >= x))
    }
    val base = (0 until 120).map { i =>
      (i.toLong, (0 until (10 + rnd.nextInt(20))).map(_ => word()).mkString(" "))
    }
    // add near-duplicates: copies with one word changed
    val dups = (0 until 30).map { i =>
      val (srcId, text) = base(rnd.nextInt(base.size))
      val toks = text.split(" ")
      toks(rnd.nextInt(toks.length)) = word()
      (1000L + i, toks.mkString(" "))
    }
    val docs = (base ++ dups).map { case (id, t) => (id, "b", t) }
      .toDF("doc_id", "lang", "text")

    def bigrams(t: String): Set[String] = {
      val w = t.split(" ").filter(_.nonEmpty)
      if (w.length < 2) Set.empty
      else w.sliding(2).map(_.mkString(" ")).toSet
    }
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val all = (base ++ dups).map { case (id, t) => (id, bigrams(t)) }
      .filter(_._2.nonEmpty)
    // 0.5 is float-exact; 0.55 is the hostile case — n*0.55 lands just
    // ABOVE an exact integer for many n (20*0.55 = 11.000000000000002),
    // which without the prefix-length epsilon shortened the PPJoin
    // prefix by one and lossily pruned boundary pairs
    for (t <- Seq(0.5, 0.55)) {
      val expected = (for {
        i <- all.indices; j <- (i + 1) until all.size
        (ia, ga) = all(i); (ib, gb) = all(j)
        inter = ga.intersect(gb).size
        jac = inter.toDouble / (ga.size + gb.size - inter)
        if jac >= t
      } yield {
        val (a, b) = if (ia < ib) (ia, ib) else (ib, ia)
        (a, b, r6(jac))
      }).toSet

      val got = graft.operators.TextOps
        .similarityJoinExact(docs, "doc_id", "lang", "text", 2, t)
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jac")))
        .toSet
      assert(expected.nonEmpty, "fixture produced no near-dup pairs — weaken mutation")
      assert(got == expected,
        s"t=$t: missing=${expected -- got}, extra=${got -- expected}")
    }
  }

  test("containmentJoin: count and prefix paths both equal brute force") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 400).map(i => s"w$i")
    val cum = vocab.indices.map(i => 1.0 / (i + 1)).scanLeft(0.0)(_ + _).tail
    val total = cum.last
    def word(): String = {
      val x = rnd.nextDouble() * total
      vocab(cum.indexWhere(_ >= x))
    }
    val base = (0 until 100).map { i =>
      (i.toLong, (0 until (12 + rnd.nextInt(20))).map(_ => word()).mkString(" "))
    }
    // quotes: short substrings of longer docs — the containment shape
    // Jaccard misses (low union overlap, high one-sided containment)
    val quotes = (0 until 25).map { i =>
      val (_, text) = base(rnd.nextInt(base.size))
      val toks = text.split(" ")
      val len = 4 + rnd.nextInt(4)
      val start = rnd.nextInt(math.max(toks.length - len, 1))
      (2000L + i, toks.slice(start, start + len).mkString(" "))
    }
    val docs = (base ++ quotes).map { case (id, t) => (id, "b", t) }
      .toDF("doc_id", "lang", "text")

    def bigrams(t: String): Set[String] = {
      val w = t.split(" ").filter(_.nonEmpty)
      if (w.length < 2) Set.empty else w.sliding(2).map(_.mkString(" ")).toSet
    }
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val all = (base ++ quotes).map { case (id, t) => (id, bigrams(t)) }
      .filter(_._2.nonEmpty)
    val expected = (for {
      i <- all.indices; j <- (i + 1) until all.size
      (ia, ga) = all(i); (ib, gb) = all(j)
      inter = ga.intersect(gb).size.toDouble
      if inter / ga.size >= 0.6 || inter / gb.size >= 0.6
    } yield {
      val ((a, na), (b, nb)) =
        if (ia < ib) ((ia, ga.size), (ib, gb.size)) else ((ib, gb.size), (ia, ga.size))
      (a, b, r6(inter / na), r6(inter / nb))
    }).toSet
    assert(expected.nonEmpty, "fixture produced no containment pairs")

    // dispatch override: avgDf=0 forces the count-join, 1e9 the prefix
    // path (bitset disabled so the legacy branches actually run); the
    // third case is the small-vocab bitmap kernel on its default dispatch
    for ((dense, bitset) <- Seq((0.0, false), (1e9, false), (64.0, true))) {
      val got = graft.operators.TextOps
        .containmentJoin(docs, "doc_id", "lang", "text", 2, 0.6, dense,
          smallVocabBitset = bitset)
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Double]("c_ab"), r.getAs[Double]("c_ba")))
        .toSet
      assert(got == expected,
        s"path(denseVocabAvgDf=$dense,bitset=$bitset): " +
          s"missing=${expected -- got}, extra=${got -- expected}")
    }
  }

  test("bitset kernel: chunked (multi-task) pairs equal single-chunk pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(23)
    val vocab = (1 to 20).map(i => s"c$i")
    val base = (0 until 160).map { i =>
      (i.toLong, if (i % 2 == 0) "x" else "y",
        (0 until (6 + rnd.nextInt(12))).map(_ => vocab(rnd.nextInt(20))).mkString(" "))
    }
    // planted near-dups (one word changed) so pairs exist at threshold —
    // same block as their source so chunked tasks must recover them
    val dups = (0 until 40).map { i =>
      val (srcId, blk, text) = base(rnd.nextInt(base.size))
      val toks = text.split(" ")
      toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(20))
      (5000L + srcId * 10 + i, blk, toks.mkString(" "))
    }
    val docs = (base ++ dups).toDF("doc_id", "lang", "text")
    val grams = docs
      .withColumn("__g", graft.operators.TextOps.shingles(
        graft.operators.TextOps.tokens(col("text")), 2))
      .filter(size(col("__g")) > 0)
      .select(col("doc_id"), col("lang"), col("__g"))
    val v = grams.select(explode(col("__g"))).distinct()
      .collect().map(_.getString(0)).sorted
    def pairs(chunkTarget: Long): Set[(Long, Long, Double)] =
      graft.operators.TextOps
        .bitsetJaccardFrom(grams, "doc_id", "lang", 0.4, v, chunkTarget)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def cont(chunkTarget: Long): Set[(Long, Long, Double, Double)] =
      graft.operators.TextOps
        .bitsetContainmentFrom(grams, "doc_id", "lang", 0.5, v, chunkTarget)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    // chunkTarget 16 over ~100-doc blocks => 7 chunks, 28 cross tasks —
    // the multi-task path; 1e9 => the single-chunk fast path
    val single = pairs(1000000000L)
    val chunked = pairs(16L)
    assert(single.nonEmpty, "fixture produced no pairs")
    assert(chunked == single,
      s"missing=${single -- chunked}, extra=${chunked -- single}")
    val cSingle = cont(1000000000L)
    val cChunked = cont(16L)
    assert(cSingle.nonEmpty, "fixture produced no containment pairs")
    assert(cChunked == cSingle,
      s"missing=${cSingle -- cChunked}, extra=${cChunked -- cSingle}")
  }

  test("similarityJoin: bitset branch equals count-join and PPJoin branches") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // DENSE tiny vocabulary — the regime that routes to the bitmap kernel
    // (every bigram frequent; prefix filtering and posting-list joins
    // both degenerate, see TextOps scaladoc)
    val vocab = (1 to 25).map(i => s"t$i")
    val base = (0 until 150).map { i =>
      (i.toLong,
        (0 until (8 + rnd.nextInt(10))).map(_ => vocab(rnd.nextInt(25))).mkString(" "))
    }
    val dups = (0 until 40).map { i =>
      val (_, text) = base(rnd.nextInt(base.size))
      val toks = text.split(" ")
      toks(rnd.nextInt(toks.length)) = vocab(rnd.nextInt(25))
      (3000L + i, toks.mkString(" "))
    }
    val docs = (base ++ dups).map { case (id, t) => (id, "b", t) }
      .toDF("doc_id", "lang", "text")
    def run(dense: Double, bitset: Boolean): Set[(Long, Long, Double)] =
      graft.operators.TextOps
        .similarityJoin(docs, "doc_id", "lang", "text", 2, 0.5, dense,
          smallVocabBitset = bitset)
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
          r.getAs[Double]("jac"))).toSet
    val viaBitset = run(64.0, bitset = true)
    val viaCount = run(0.0, bitset = false)
    val viaPrefix = run(1e9, bitset = false)
    assert(viaBitset.nonEmpty, "fixture produced no near-dup pairs")
    assert(viaBitset == viaCount,
      s"bitset vs count: missing=${viaCount -- viaBitset}, extra=${viaBitset -- viaCount}")
    assert(viaBitset == viaPrefix,
      s"bitset vs prefix: missing=${viaPrefix -- viaBitset}, extra=${viaBitset -- viaPrefix}")
  }
}

/** Boundary-stress for the fast-gate + exact-round kernels: random
  * corpora large enough that some candidate pairs statistically land
  * within the 1e-6/2e-6 gates of the decision boundary, where a too-tight
  * gate silently drops pairs. Brute force mirrors the kernels'
  * accumulation order and BigDecimal rounding exactly.
  */
class KernelBoundarySpec extends org.scalatest.funsuite.AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dotRef(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }
  private def r6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  test("blockedCosinePairs: rounding gate never drops a boundary pair (2M pairs)") {
    val rnd = new scala.util.Random(97)
    val n = 2000
    val vecs = Array.tabulate(n)(i =>
      (i.toLong, Array.fill(4)(rnd.nextFloat() * 2 - 1)))
    val minCos = 0.6
    val nrm = vecs.map(v => math.sqrt(dotRef(v._2, v._2)))
    val expected = (for {
      i <- vecs.indices.iterator
      j <- (i + 1) until n
      c = r6(dotRef(vecs(i)._2, vecs(j)._2) / (nrm(i) * nrm(j)))
      if c >= minCos
    } yield (vecs(i)._1, vecs(j)._1, c)).toSet
    val boundary = (for {
      i <- vecs.indices.iterator
      j <- (i + 1) until n
      u = dotRef(vecs(i)._2, vecs(j)._2) / (nrm(i) * nrm(j))
      if math.abs(u - minCos) < 1e-6
    } yield 1).size
    val df = vecs.toSeq.map { case (id, v) => (id, "b", v) }
      .toDF("vec_id", "label", "embedding")
    val got = graft.operators.VectorOps.blockedCosinePairs(
      df, "vec_id", "label", "embedding", minCosine = minCos)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == expected,
      s"boundary pairs in fixture: $boundary; " +
        s"missing=${expected -- got}, extra=${got -- expected}")
    // chunk-pair parallel path (chunkTarget 128 over a 2000-row block =>
    // 16 chunks, 136 tasks) must produce the identical pair set
    val chunked = graft.operators.VectorOps.blockedCosinePairs(
      df, "vec_id", "label", "embedding", minCosine = minCos,
      chunkTarget = 128L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(chunked == expected,
      s"chunked: missing=${expected -- chunked}, extra=${chunked -- expected}")
  }

  test("exactKnnKernel: deferred rounding reproduces full-rounding top-k") {
    val rnd = new scala.util.Random(131)
    val n = 1500
    val k = 5
    val vecs = Array.tabulate(n)(i =>
      (i.toLong, Array.fill(3)(rnd.nextFloat() * 2 - 1)))
    val nrm = vecs.map(v => math.sqrt(dotRef(v._2, v._2)))
    val expected = vecs.indices.flatMap { qi =>
      vecs.indices.filter(_ != qi)
        .map(j => (r6(dotRef(vecs(qi)._2, vecs(j)._2) / (nrm(qi) * nrm(j))),
          vecs(j)._1))
        .sortBy { case (c, nid) => (-c, nid) }
        .take(k)
        .map { case (c, nid) => (7, vecs(qi)._1, nid, c) }
    }.toSet
    val df = vecs.toSeq.map { case (id, v) => (id, 7, v) }
      .toDF("vec_id", "label", "embedding")
    val got = graft.operators.VectorOps.knnGraph(df, k)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)}, extra=${(got -- expected).take(5)}")
    // two-stage chunked path (chunkTarget 128 => 12 chunks, partial
    // top-k + margin merge) must reproduce the same exact graph
    val chunked = graft.operators.VectorOps.exactKnnKernel(df, k,
      chunkTarget = 128L)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(chunked == expected,
      s"chunked: missing=${(expected -- chunked).take(5)}, " +
        s"extra=${(chunked -- expected).take(5)}")
  }
}

/** Round-11 review edge cases on the filter-rule and skew-join planes. */
class FilterRulesEdgeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("ignores=0 suppresses nothing; ignores=2 keeps every third") {
    // rn % 1 is always 0, so the old literal-1 comparison dropped EVERY
    // row at ignores=0 — the natural "no suppression" setting
    val df = (1 to 9).map(i => ("k", i)).toDF("key", "seq")
    def kept(n: Int) = graft.operators.FilterRules
      .withIgnores(df, lit(true), col("key"), Seq(col("seq")), n)
      .select("seq").as[Int].collect().toSeq.sorted
    assert(kept(0) == (1 to 9))
    assert(kept(2) == Seq(1, 4, 7))
  }

  test("regex rule is a full match even with top-level alternation") {
    // bare ^abc|def$ matches prefix-abc OR suffix-def; the rule must
    // match the reference's whole-line matches() contract
    val df = Seq("abc", "def", "zzzdef", "abcz").toDF("line")
    val got = df
      .filter(graft.operators.FilterRules.regex(col("line"), "abc|def"))
      .as[String].collect().toSet
    assert(got == Set("abc", "def"))
  }

  test("saltedJoin rejects small-side-preserving outer joins") {
    // the small side is replicated saltFactor times, so a right/full
    // outer join would emit unmatched small rows once per replica
    val large = Seq((1, "x")).toDF("k", "v")
    val small = Seq((1, "a"), (2, "b")).toDF("k", "name")
    intercept[IllegalArgumentException] {
      graft.operators.Skew.saltedJoin(large, small, "k", 4, "right_outer")
    }
    intercept[IllegalArgumentException] {
      graft.operators.Skew.saltedJoin(large, small, "k", 4, "full_outer")
    }
    assert(graft.operators.Skew
      .saltedJoin(large, small, "k", 4, "left").count() == 1)
  }
}
