package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.alerts.{MatrixMath, Rfc822, SmtpClient}
import graft.sources.I2cScript

/** Property tests for the round-3 pure kernels: the arithmetic solver
  * against a reference evaluator, rfc822 header/body round-trips, i2c
  * bit packing against independent arithmetic, and PNG decode against
  * the JRE's encoder on randomized images. Sampling is seeded, so runs
  * are reproducible.
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic scalacheck sampler (the scalatestplus bridge is not
    * on the classpath): n seeded samples through the property.
    */
  private def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(987654321L)
    var i = 0
    while (i < n) {
      gen.apply(params, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(for { a <- g1; b <- g2 } yield (a, b))(t => f(t._1, t._2))

  // ---- MatrixMath vs a direct AST evaluator ----

  private sealed trait Expr
  private case class Num(v: Int) extends Expr
  private case class Ref(n: String) extends Expr
  private case class Bin(op: Char, l: Expr, r: Expr) extends Expr

  private def genExpr(depth: Int): Gen[Expr] =
    if (depth == 0) Gen.oneOf(
      Gen.choose(0, 99).map(Num),
      Gen.oneOf("x", "y", "z").map(Ref))
    else Gen.frequency(
      2 -> genExpr(0),
      3 -> (for {
        op <- Gen.oneOf('+', '-', '*')
        l <- genExpr(depth - 1)
        r <- genExpr(depth - 1)
      } yield Bin(op, l, r)))

  private def render(e: Expr): String = e match {
    case Num(v) => v.toString
    case Ref(n) => n
    case Bin(op, l, r) => s"(${render(l)}$op${render(r)})"
  }

  private def eval(e: Expr, refs: Map[String, Double]): Double = e match {
    case Num(v) => v.toDouble
    case Ref(n) => refs(n)
    case Bin('+', l, r) => eval(l, refs) + eval(r, refs)
    case Bin('-', l, r) => eval(l, refs) - eval(r, refs)
    case Bin('*', l, r) => eval(l, refs) * eval(r, refs)
    case Bin(_, _, _) => throw new IllegalStateException
  }

  test("MatrixMath.solve agrees with a direct AST evaluation") {
    val refs = Map("x" -> 3.0, "y" -> -7.0, "z" -> 0.5)
    forAll(genExpr(4)) { e =>
      assert(MatrixMath.solve(render(e), refs).contains(eval(e, refs)))
    }
  }

  test("MatrixMath rejects unknown refs and trailing junk") {
    assert(MatrixMath.solve("q+1", Map.empty).isEmpty)
    assert(MatrixMath.solve("1+2)", Map.empty).isEmpty)
    assert(MatrixMath.solve("", Map.empty).isEmpty)
  }

  // ---- rfc822 ----

  private val genHeaderVal = Gen.alphaNumStr.suchThat(_.nonEmpty)

  test("Rfc822.split round-trips generated header maps and bodies") {
    val genMsg = for {
      subject <- genHeaderVal
      from <- genHeaderVal
      body <- Gen.listOf(Gen.alphaNumStr).map(_.mkString("\n"))
    } yield (subject, from, body)
    forAll(genMsg) { case (subject, from, body) =>
      val raw = s"Subject: $subject\r\nFrom: <$from@x.com>\r\n" +
        s"Content-Type: text/plain\r\n\r\n$body"
      val (h, b) = Rfc822.split(raw)
      assert(h("subject") == subject)
      assert(Rfc822.address(h("from")) == s"$from@x.com")
      assert(b == body.replace("\r\n", "\n"))
    }
  }

  test("SmtpClient.bareAddress strips display names and pipe suffixes") {
    forAll(genHeaderVal, genHeaderVal) { (name, local) =>
      val addr = s"$local@x.com"
      assert(SmtpClient.bareAddress(addr) == addr)
      assert(SmtpClient.bareAddress(s"$name <$addr>") == addr)
      assert(SmtpClient.bareAddress(s"$addr|whatever") == addr)
    }
  }

  // ---- i2c bit packing ----

  test("16/24/32-bit packing inverts independent byte arithmetic, both orders") {
    forAll(Gen.choose(0, 0xffff)) { v =>
      val msb = Seq(v >> 8, v & 0xff)
      assert(I2cScript.convertBytes(msb, 16, msbFirst = true, signed = false) == Seq(v.toDouble))
      assert(I2cScript.convertBytes(msb.reverse, 16, msbFirst = false, signed = false) == Seq(v.toDouble))
      val signedExpect = v.toShort.toDouble // JVM two's complement as truth
      assert(I2cScript.convertBytes(msb, 16, msbFirst = true, signed = true) == Seq(signedExpect))
    }
    forAll(Gen.choose(0, 0xffffff)) { v =>
      val msb = Seq(v >> 16, (v >> 8) & 0xff, v & 0xff)
      assert(I2cScript.convertBytes(msb, 24, msbFirst = true, signed = false) == Seq(v.toDouble))
      assert(I2cScript.convertBytes(msb.reverse, 24, msbFirst = false, signed = false) == Seq(v.toDouble))
    }
    forAll(Gen.choose(Int.MinValue, Int.MaxValue)) { v =>
      val u = v.toLong & 0xffffffffL
      val msb = Seq((u >> 24).toInt, ((u >> 16) & 0xff).toInt,
        ((u >> 8) & 0xff).toInt, (u & 0xff).toInt)
      assert(I2cScript.convertBytes(msb, 32, msbFirst = true, signed = true) == Seq(v.toDouble))
      assert(I2cScript.convertBytes(msb, 32, msbFirst = true, signed = false) == Seq(u.toDouble))
    }
  }

  test("wav decode recovers sample counts and peak for random PCM payloads") {
    val gen = for {
      rate <- Gen.oneOf(8000, 16000, 44100)
      n <- Gen.choose(1, 500)
      peak <- Gen.choose(1, 32767)
    } yield (rate, n, peak)
    forAll(gen) { case (rate, n, peak) =>
      // square wave at the chosen peak: RMS == peak, easy exact checks
      val samples = Array.tabulate(n)(i => if (i % 2 == 0) peak else -peak)
      val buf = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + n * 2)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      buf.put("data".getBytes("US-ASCII")).putInt(n * 2)
      samples.foreach(s => buf.putShort(s.toShort))
      val Some((r, ch, bps, mono)) =
        graft.streaming.Multimodal.decodeWav(buf.array())
      assert(r == rate && ch == 1 && bps == 16 && mono.length == n)
      assert(math.abs(mono.map(math.abs).max - peak / 32768.0) < 1e-9)
    }
  }

  test("container probes terminate on fuzzed/mutated headers (no hang, no throw)") {
    // the round-4 AVI bug class: a forged 32-bit size walked the cursor
    // backwards forever. Fuzz both pure-random buffers and valid-magic
    // prefixes with random tails — every probe must RETURN (None or not)
    val magic = Gen.oneOf(
      "RIFF....AVI ".getBytes("US-ASCII"),
      Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("US-ASCII"),
      "RIFF....WAVE".getBytes("US-ASCII"),
      Array.emptyByteArray)
    val gen = for {
      m <- magic
      n <- Gen.choose(0, 96)
      tail <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield m ++ tail.toArray
    forAll(gen, n = 400) { bytes =>
      graft.streaming.Multimodal.probeVideo(bytes) // must terminate
      graft.streaming.Multimodal.decodeWav(bytes)  // must terminate
      graft.streaming.Multimodal.decodePixels(bytes)
      graft.streaming.Multimodal.aviVideoFrames(bytes) // must terminate
      ()
    }
  }

  test("IMA ADPCM decode terminates on forged channels/blockAlign/data") {
    // the block walk advances by blockAlign per iteration — a forged
    // blockAlign of 0, or channels of 0/65535, must make decodeWav
    // return (None or short output), never spin or throw
    val gen = for {
      channels <- Gen.oneOf(0, 1, 2, 3, 255, 65535)
      blockAlign <- Gen.oneOf(0, 1, 4, 8, 512, 65535)
      n <- Gen.choose(0, 200)
      data <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield {
      val buf = java.nio.ByteBuffer.allocate(56 + n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(48 + n)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(20)
        .putShort(0x11).putShort(channels.toShort).putInt(8000).putInt(4000)
        .putShort(blockAlign.toShort).putShort(4).putShort(2).putShort(505)
      buf.put("data".getBytes("US-ASCII")).putInt(8 + n)
      buf.putShort(0).put(0.toByte).put(0.toByte)
      buf.put(Array[Byte](0x04, 0x00, 0x08, 0x00)).put(data.toArray)
      buf.array()
    }
    forAll(gen, n = 200) { bytes =>
      graft.streaming.Multimodal.decodeWav(bytes) // must terminate
      ()
    }
  }

  /** Build a minimal-but-valid MJPEG AVI: RIFF(AVI ) with an hdrl/avih
    * header and a movi LIST of 00dc chunks, each a complete ImageIO JPEG.
    */
  private def buildMjpegAvi(framesJpeg: Seq[Array[Byte]], w: Int, h: Int): Array[Byte] = {
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(8 + payload.length + (payload.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      buf.array()
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(12 + body.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("LIST".getBytes("US-ASCII")).putInt(4 + body.length)
        .put(typ.getBytes("US-ASCII")).put(body)
      buf.array()
    }
    val avih = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(33333)                 // dwMicroSecPerFrame (30 fps)
    avih.putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, flags
    avih.putInt(framesJpeg.length)     // dwTotalFrames
    avih.putInt(0).putInt(1).putInt(0) // initialFrames, streams, suggestedBuf
    avih.putInt(w).putInt(h)           // dwWidth, dwHeight
    val hdrl = list("hdrl", chunk("avih", avih.array()))
    val movi = list("movi", framesJpeg.flatMap(f => chunk("00dc", f)).toArray)
    val body = hdrl ++ movi
    val buf = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("AVI ".getBytes("US-ASCII")).put(body)
    buf.array()
  }

  test("MJPEG-in-AVI frames decode to real pixels (pixel-equal vs ImageIO)") {
    System.setProperty("java.awt.headless", "true")
    val (w, h) = (16, 12)
    // distinct per-frame patterns so frame ORDER is also pinned
    val sources = (0 until 4).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((40 * f + 30) << 16) | ((60 * f + 20) << 8) | (50 * f + 10))
      img
    }
    val jpegs = sources.map { img =>
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val avi = buildMjpegAvi(jpegs, w, h)

    // container probe still reads the header
    val info = graft.streaming.Multimodal.probeVideo(avi).get
    assert(info.width == w && info.height == h && info.frames == 4)

    // the movi walk recovers each JPEG byte-exactly
    val frames = graft.streaming.Multimodal.aviVideoFrames(avi)
    assert(frames.length == 4)
    frames.zip(jpegs).foreach { case (got, want) => assert(got.sameElements(want)) }

    // and each frame pixel-decodes identically to ImageIO reading the
    // same JPEG (same decoder behind decodePixelsAny's fallback), with
    // every frame near its solid source color (JPEG is lossy but flat
    // fields stay within a couple of code values)
    frames.zipWithIndex.foreach { case (jpeg, f) =>
      val px = graft.streaming.Multimodal.decodePixelsAny(jpeg).get
      assert(px.width == w && px.height == h && px.channels == 3)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      for (y <- 0 until h; x <- 0 until w) {
        val e = ref.getRGB(x, y)
        val o = (y * w + x) * 3
        assert((px.pixels(o) & 0xff) == ((e >> 16) & 0xff))
        assert((px.pixels(o + 1) & 0xff) == ((e >> 8) & 0xff))
        assert((px.pixels(o + 2) & 0xff) == (e & 0xff))
      }
      val exp = sources(f).getRGB(0, 0)
      val mid = ((h / 2) * w + w / 2) * 3
      assert(math.abs((px.pixels(mid) & 0xff) - ((exp >> 16) & 0xff)) <= 4,
        s"frame $f drifted from its source color")
    }

    // frameSample ships the REAL chunks through the Dataset plumbing
    val spark0 = SparkTestSession.spark
    import spark0.implicits._
    val ds = Seq(graft.streaming.MediaRecord(7L, "video/avi", avi, Map.empty)).toDS()
    val sampled = graft.streaming.Multimodal.frameSample(ds, 2).collect()
      .sortBy(_.frameIdx)
    assert(sampled.map(_.frameIdx).toSeq == Seq(0, 2))
    assert(sampled(0).frameBytes.sameElements(jpegs(0)))
    assert(sampled(1).frameBytes.sameElements(jpegs(2)))
  }

  test("PNG decode matches ImageIO for random image sizes and content") {
    System.setProperty("java.awt.headless", "true")
    val gen = for {
      w <- Gen.choose(1, 40)
      h <- Gen.choose(1, 30)
      seed <- Gen.choose(0L, Long.MaxValue)
    } yield (w, h, seed)
    forAll(gen) { case (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rnd.nextInt(0xffffff))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      val decoded = graft.streaming.Multimodal.decodePixels(out.toByteArray).get
      assert(decoded.width == w && decoded.height == h && decoded.channels == 3)
      for (y <- 0 until h; x <- 0 until w) {
        val e = img.getRGB(x, y)
        val o = (y * w + x) * 3
        assert((decoded.pixels(o) & 0xff) == ((e >> 16) & 0xff))
        assert((decoded.pixels(o + 1) & 0xff) == ((e >> 8) & 0xff))
        assert((decoded.pixels(o + 2) & 0xff) == (e & 0xff))
      }
    }
  }
}
