package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextOps, VectorOps}

/** Regression pins for the round-13 kernel-plane review findings — each
  * test encodes a contract the review found claimed-but-unenforced (or
  * silently violated) in the operator kernels:
  *  - exact k-NN: NaN cosines (zero-norm vectors) must never occupy top-k
  *    slots (pre-fix they entered via the filled<k short-circuit, could
  *    never be displaced, and silently truncated every real neighbor list);
  *  - ANN entry points that cast ids to long must REFUSE non-numeric ids
  *    at plan time (pre-fix the null-propagating =!= filter returned a
  *    silently empty result);
  *  - knnGraph's label takes the same guard (the exact branch casts it to
  *    int while the IVF branch carries it raw — a string label would make
  *    semantics depend on the size dispatch);
  *  - lsh buckets() must refuse planes > 64 (1L << p wraps mod 64 and the
  *    + combine carries collisions into higher bits);
  *  - the BPE trainer stops when no mergeable pair remains (iters is a
  *    budget, not a guarantee — pre-fix an exhausted vocabulary threw
  *    ArrayIndexOutOfBoundsException from the argmax).
  */
class KernelContractsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emb(rows: Seq[(Int, Long, Array[Float])]) =
    rows.toDF("label", "vec_id", "embedding")

  // 5 well-formed vectors + 1 zero-norm (cosine NaN against everything)
  private val withZeroNorm = Seq(
    (1, 1L, Array(1.0f, 0.0f)),
    (1, 2L, Array(0.9f, 0.1f)),
    (1, 3L, Array(0.8f, 0.2f)),
    (1, 4L, Array(0.7f, 0.3f)),
    (1, 5L, Array(0.6f, 0.4f)),
    (1, 99L, Array(0.0f, 0.0f)))

  private def assertFullLists(df: org.apache.spark.sql.DataFrame,
      k: Int): Unit = {
    val byQ = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"),
        r.getAs[Double]("cos_r")))
      .groupBy(_._1)
    (1L to 5L).foreach { q =>
      val ns = byQ.getOrElse(q, Array.empty)
      assert(ns.length == k,
        s"q=$q neighbor list truncated to ${ns.length} (NaN slot theft?)")
      assert(ns.forall(t => !t._3.isNaN && t._2 != 99L),
        s"q=$q returned a NaN/zero-norm neighbor: ${ns.toSeq}")
    }
    // the zero-norm query has no defined cosine to anything: empty list
    assert(!byQ.contains(99L),
      s"zero-norm query emitted neighbors: ${byQ.get(99L).map(_.toSeq)}")
  }

  test("exact kNN (single-block): zero-norm vectors never steal top-k slots") {
    assertFullLists(
      VectorOps.knnGraph(emb(withZeroNorm), 3, exactBlockMax = Long.MaxValue),
      k = 3)
  }

  test("exact kNN (chunked): zero-norm vectors never steal top-k slots") {
    assertFullLists(
      VectorOps.exactKnnKernel(emb(withZeroNorm), 3, chunkTarget = 2L),
      k = 3)
  }

  test("ANN entry points refuse non-numeric id columns at plan time") {
    val sdf = Seq(("doc1", Array(1.0f, 0.0f)), ("doc2", Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cb = Array(Array(Array(0.0, 0.0)))
    val qs = Array((0L, Array(1.0, 0.0)))
    val e1 = intercept[IllegalArgumentException] {
      VectorOps.adcSearch(sdf, "vec_id", "embedding", cb, qs, k = 2)
    }
    assert(e1.getMessage.contains("adcSearch"))
    val e2 = intercept[IllegalArgumentException] {
      VectorOps.ivfPqSearch(sdf, "vec_id", "embedding", qs,
        nCells = 2, m = 1, k = 2, kTop = 2, nProbe = 1)
    }
    assert(e2.getMessage.contains("ivfPqSearch"))
  }

  test("knnGraph refuses a non-numeric label (dispatch-dependent semantics otherwise)") {
    val sdf = Seq(("7", 1L, Array(1.0f, 0.0f)), ("07", 2L, Array(0.0f, 1.0f)))
      .toDF("label", "vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      VectorOps.knnGraph(sdf, 1)
    }
    assert(e.getMessage.contains("label"))
  }

  test("lsh buckets refuses planes outside [1,64]") {
    import org.apache.spark.sql.functions.col
    val e = intercept[IllegalArgumentException] {
      VectorOps.buckets(col("embedding"), planes = 65)
    }
    assert(e.getMessage.contains("64"))
    // 64 itself is legal (the full bucket-id width)
    VectorOps.buckets(col("embedding"), planes = 64)
  }

  test("BPE trainer stops when the vocabulary is fully merged (iters is a budget)") {
    // one two-char word: exactly one learnable merge; iters = 5 must
    // return that single rule instead of indexing into an empty argmax
    val docs = Seq("ab", "ab", "ab").toDF("text")
    val merges = TextOps.bpeMerges(docs, "text", iters = 5).collect()
    assert(merges.length == 1, s"expected 1 merge, got ${merges.toSeq}")
    assert(merges(0).getAs[String]("merged") == "ab")
  }

  // ---- streaming sketch contracts (Sketches.scala review wave) ----

  test("madGate: zero MAD does not disarm the gate (flat baseline then spike)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{MadPoint, Sketches}
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = Sketches.madGate(mem.toDS(), warmup = 30)
      .writeStream.format("memory").queryName("mad_zero")
      .outputMode("update").start()
    try {
      // constant baseline: med = 5, MAD = 0 — the batch twin's
      // dev > 3*1.4826*0 flags ANY positive deviation; pre-fix the
      // madEst > 0 arm condition suppressed the spike forever
      mem.addData((0 until 35).map(_ => ("flat", 5.0)): _*)
      mem.addData(("flat", 500.0), ("flat", 5.0))
      q.processAllAvailable()
      val rows = spark.table("mad_zero").as[MadPoint].collect()
      assert(rows.filter(_.anomaly).map(_.value).toSet == Set(500.0),
        s"zero-MAD spike handling wrong: ${rows.filter(_.anomaly).toSeq}")
    } finally q.stop()
  }

  test("madGate: NaN input is flagged and never poisons the sketches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{MadPoint, Sketches}
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = Sketches.madGate(mem.toDS(), warmup = 30)
      .writeStream.format("memory").queryName("mad_nan")
      .outputMode("update").start()
    try {
      // median 10, MAD 2 baseline; then a burst of NaNs; then a spike
      // and a normal point — pre-fix the NaNs entered the remedian
      // buffers, skewed/NaN'd the estimates and disarmed the gate
      mem.addData((0 until 63).map(i => ("s", 10.0 + (i % 7) - 3)): _*)
      mem.addData((0 until 8).map(_ => ("s", Double.NaN)): _*)
      mem.addData(("s", 1000.0), ("s", 11.0))
      q.processAllAvailable()
      val rows = spark.table("mad_nan").as[MadPoint].collect()
      val nanRows = rows.filter(_.value.isNaN)
      assert(nanRows.nonEmpty && nanRows.forall(_.anomaly),
        "NaN inputs after warmup must be flagged (batch twin's NaN-largest compare)")
      assert(rows.forall(r => !r.med.isNaN && !r.mad.isNaN),
        "NaN leaked into the remedian estimates")
      val spike = rows.filter(_.value == 1000.0)
      assert(spike.nonEmpty && spike.forall(_.anomaly),
        "gate disarmed by NaN burst: spike after recovery not flagged")
      assert(rows.filter(_.value == 11.0).forall(!_.anomaly),
        "normal point after NaN burst falsely flagged")
    } finally q.stop()
  }

  test("streaming sketch preconditions refuse at plan time, not mid-stream") {
    import graft.streaming.Sketches
    implicit val sc = spark.sqlContext
    val ds = Seq("a", "b").toDS()
    intercept[IllegalArgumentException] {
      Sketches.spaceSavingTopK(ds, shards = 1, capacity = 0, k = 4)
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomNovelty(ds, shards = 1, nBits = 4096, nHashes = 0)
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomNovelty(ds, shards = 0, nBits = 4096, nHashes = 4)
    }
    intercept[IllegalArgumentException] {
      Sketches.hllDistinct(ds, shards = 0, p = 12)
    }
    // p-mismatched HLL shards refuse instead of crashing or silently
    // merging a prefix into a wrong union estimate
    intercept[IllegalArgumentException] {
      Sketches.mergeHllRegisters(
        Seq(new Array[Byte](1 << 12), new Array[Byte](1 << 14)), p = 12)
    }
    // string ids refuse before the continuous query starts
    val sdf = Seq(("doc1", "k")).toDF("doc_id", "key")
    intercept[IllegalArgumentException] {
      Sketches.streamingExactDedup(sdf, "doc_id", "key")
    }
    intercept[IllegalArgumentException] {
      Sketches.streamingLshCandidates(sdf, "doc_id", "key")
    }
  }

  // ---- FLAC decoder spec-validation contracts (Flac.scala review wave) ----

  /** Re-seal a single-frame FLAC stream after tampering its frame header:
    * recompute the header CRC-8 and the whole-frame CRC-16 so the decode
    * reaches the tampered field instead of failing the checksum first.
    */
  private def resealFrame(bytes: Array[Byte], frameStart: Int): Unit = {
    import graft.streaming.Flac
    val bsCode = (bytes(frameStart + 2) >> 4) & 0xF
    val srCode = bytes(frameStart + 2) & 0xF
    val utf8First = bytes(frameStart + 4) & 0xFF
    val utf8Len =
      if (utf8First < 0x80) 1
      else Integer.numberOfLeadingZeros(~(utf8First << 24)) // 2-7 bytes
    val bsExtra = bsCode match { case 6 => 1; case 7 => 2; case _ => 0 }
    val srExtra = srCode match { case 12 => 1; case 13 | 14 => 2; case _ => 0 }
    val headerEnd = frameStart + 4 + utf8Len + bsExtra + srExtra
    bytes(headerEnd) = Flac.crc8(bytes, frameStart, headerEnd).toByte
    val frameEnd = bytes.length - 2 // single-frame stream: CRC-16 is last
    val c16 = Flac.crc16(bytes, frameStart, frameEnd)
    bytes(frameEnd) = ((c16 >> 8) & 0xFF).toByte
    bytes(frameEnd + 1) = (c16 & 0xFF).toByte
  }

  test("FLAC decoder rejects reserved channel assignments and the forbidden sample-rate code") {
    import graft.streaming.Flac
    val pcm = Array.tabulate[Short](256)(i => (i * 13 % 251).toShort)
    val good = Flac.encodeFlac(44100, 2, pcm, blockSize = 256)
    assert(Flac.decodeFlacPcm(good).exists(_.nFrames == 1), "sanity: good stream")
    val frameStart = 4 + 4 + 34 // fLaC + metadata header + STREAMINFO

    // chAsgn = 0b1011 (reserved 11-15): RFC 9639 decoder MUST reject;
    // pre-fix it fell through to the 2-channel independent path and
    // decoded wrong samples with no error
    val t1 = good.clone()
    t1(frameStart + 3) = ((0xB << 4) | (t1(frameStart + 3) & 0x0F)).toByte
    resealFrame(t1, frameStart)
    assert(Flac.decodeFlacPcm(t1).forall(_.nFrames == 0),
      "reserved channel assignment 11 was accepted")

    // srCode = 0b1111 (forbidden, prevents sync-fooling)
    val t2 = good.clone()
    t2(frameStart + 2) = ((t2(frameStart + 2) & 0xF0) | 0xF).toByte
    resealFrame(t2, frameStart)
    assert(Flac.decodeFlacPcm(t2).forall(_.nFrames == 0),
      "forbidden sample-rate code 15 was accepted")
  }

  // ---- multimodal codec contracts (Multimodal.scala review wave) ----

  private def pngChunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val len = data.length
    out.write(len >> 24); out.write(len >> 16); out.write(len >> 8); out.write(len)
    out.write(ctype.getBytes("US-ASCII"))
    out.write(data)
    out.write(Array[Byte](0, 0, 0, 0)) // crc unchecked by the walker
    out.toByteArray
  }

  test("PNG decoder returns None (not an infinite loop) on an FDICT zlib stream") {
    import graft.streaming.Multimodal
    // zlib header 0x78 0x20: valid FCHECK, FDICT=1 (forbidden by PNG
    // RFC 2083 §2.2) — pre-fix Inflater.inflate returned 0 forever with
    // needsDictionary() true and needsInput() false, spinning the task
    val ihdr = Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 8, 0, 0, 0, 0) // 1x1 gray
    val idat = Array[Byte](0x78, 0x20, 1, 2, 3, 4, 5, 6, 7, 8)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", idat) ++
      pngChunk("IEND", Array.empty)
    assert(Multimodal.decodePixels(png).isEmpty)
  }

  test("PPM/BMP decoders refuse lying and zero dimensions") {
    import graft.streaming.Multimodal
    // w*h*3 wraps Int to 6: pre-fix returned a 6-byte PixelImage claiming
    // width 1431655766, crashing resizeLuma downstream
    val lying = ("P6 1431655766 3 255\n").getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6)
    assert(Multimodal.decodePixels(lying).isEmpty, "overflowing PPM dims accepted")
    val zero = ("P6 0 0 255\n").getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    assert(Multimodal.decodePixels(zero).isEmpty, "zero-dim PPM accepted")
    // dims beyond Int range must fall back to None, not NumberFormatException
    val huge = ("P6 99999999999999 5 255\n").getBytes("US-ASCII") ++
      new Array[Byte](32)
    assert(Multimodal.decodeDims(huge).isEmpty, "out-of-Int PPM dims threw/accepted")
    // zero-width 24bpp BMP
    val bmp = new Array[Byte](60)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(10) = 54 // data offset
    bmp(14) = 40 // BITMAPINFOHEADER
    // width at 18 stays 0; height at 22 = 1
    bmp(22) = 1
    bmp(28) = 24 // bpp
    assert(Multimodal.decodePixels(bmp).isEmpty, "zero-width BMP accepted")
  }

  test("GIF: GCE transparency preserves the prior canvas; LZW min-code 9-11 rejected") {
    import graft.streaming.Multimodal
    // hand-built GIF89a, 2x1, 2-entry GCT, GCE transIdx=1, pixels [0, 1]:
    // pixel 1 is transparent so the (black) initial canvas shows through
    def gifWith(minCode: Int, gceFlags: Int): Array[Byte] =
      Array[Byte]('G', 'I', 'F', '8', '9', 'a',
        2, 0, 1, 0, 0x80.toByte, 0, 0, // LSD: 2x1, GCT of 2
        10, 20, 30, 200.toByte, 100, 50, // GCT
        0x21, 0xF9.toByte, 4, gceFlags.toByte, 0, 0, 1, 0, // GCE, transIdx=1
        0x2C, 0, 0, 0, 0, 2, 0, 1, 0, 0, // image descriptor 2x1
        minCode.toByte, 2, 0x44, 0x0A, 0, // LZW: clear,0,1,eoi at width 3
        0x3B)
    val frames = Multimodal.gifFrames(gifWith(2, gceFlags = 1))
    assert(frames.length == 1)
    val px = frames(0).pixels
    assert((px(0), px(1), px(2)) == (10.toByte, 20.toByte, 30.toByte))
    assert((px(3), px(4), px(5)) == (0.toByte, 0.toByte, 0.toByte),
      "transparent pixel was painted with its palette colour")
    // same stream without the transparent flag paints both pixels
    val opaque = Multimodal.gifFrames(gifWith(2, gceFlags = 0))(0).pixels
    assert(opaque(3) == 200.toByte, "opaque decode regressed")
    // LZW minimum code size 9 is outside GIF89a's valid 2-8
    assert(Multimodal.gifFrames(gifWith(9, gceFlags = 0)).isEmpty,
      "forbidden LZW min-code size 9 accepted")
  }

  test("video probes: AVI avih garbage refused; MP4 size-0 last box parsed") {
    import graft.streaming.Multimodal
    def le32(v: Long): Array[Byte] =
      Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def be32(v: Long): Array[Byte] =
      Array[Byte]((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    // AVI whose avih carries u32 values past Int range: pre-fix emitted
    // negative width/frames and a Long-overflowed duration
    val avih = le32(0xFFFFFFFFL) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(0xFFFFFFFFL) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(0x80000000L) ++ le32(100)
    val hdrl = "hdrl".getBytes ++ "avih".getBytes ++ le32(avih.length.toLong) ++ avih
    val avi = "RIFF".getBytes ++ le32(4 + 8 + hdrl.length.toLong) ++
      "AVI ".getBytes ++ "LIST".getBytes ++ le32(hdrl.length.toLong) ++ hdrl
    assert(Multimodal.probeVideo(avi).isEmpty,
      "implausible avih fields emitted as metadata")
    // MP4 whose LAST box (moov) uses size=0 = extends-to-EOF (ISO
    // 14496-12 §4.2): pre-fix the walk corrupt-stopped before moov
    // v0 mvhd: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4)
    val mvhd = be32(28) ++ "mvhd".getBytes ++ new Array[Byte](12) ++
      be32(1000) ++ be32(5000)
    val moov = be32(0) ++ "moov".getBytes ++ mvhd
    val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0)
    val got = Multimodal.probeVideo(ftyp ++ moov)
    assert(got.exists(v => math.abs(v.durationSec - 5.0) < 1e-9),
      s"size-0 trailing moov not parsed: $got")
  }
}
