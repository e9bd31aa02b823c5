package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MathDsl
import graft.streaming.{EpochSnapshot, RtVals, ValUpdate}

class MathDslSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def eval(dcafs: String, fields: Seq[Double]): Double = {
    val df = Seq(fields.map(_.toString)).toDF("__f")
    df.selectExpr(s"${MathDsl.compile(dcafs)} AS v").collect()(0).getDouble(0)
  }

  // FIXTURES.md §1.5 MathFab goldens (scale-8 HALF_UP on the reference;
  // double + round(8) reproduces them).
  test("mathfab golden formulas") {
    assert(math.abs(BigDecimal(eval("(15*i0)/65+3*i1", Seq(10.0, 3.5)))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble - 12.80769231) < 1e-9)
    assert(eval("(15+i0)^2-16*i1+16+25+36+58+i2/5", Seq(5.0, 65.0, 86.0)) == -487.8)
    assert(eval("i0*-5", Seq(5.0)) == -25.0)
  }

  test("word-form comparisons compile") {
    val df = Seq(("1500.0,7.0")).toDF("line").withColumn("__f", split(col("line"), ","))
    val pred = MathDsl.compile("i0 below 2500 and i0 above 10")
    assert(df.filter(pred).count() == 1)
    val range = MathDsl.compile("i1 from 1 to 10")
    assert(df.filter(range).count() == 1)
    assert(df.filter(MathDsl.compile("i1 above 10")).count() == 0)
  }

  test("rtvals refs compile to state columns") {
    assert(MathDsl.compile("i0 + {r:temp}") ==
      "TRY_CAST(try_element_at(__f, 1) AS DOUBLE) + __rt_r_temp")
  }

  test("string literals are opaque to every rewrite") {
    // round-11 review: the DSL rewrites ran quote-blind over whole SQL
    // rule strings, so a regex filter's '^...$' was parsed as a power
    // operator (compile crash) and a contain filter's 'above' was
    // rewritten to '>' (silently matching the wrong rows)
    // backslashes DOUBLE on restore: the compiled text feeds expr(),
    // whose default literal mode eats single backslashes — '^\d+$' would
    // reach the RLIKE as '^d+$' (MetamorphicSpec regression)
    assert(MathDsl.compile(raw"line RLIKE '^\d+$$'") == raw"line RLIKE '^\\d+$$'")
    assert(Seq("123", "12a").toDF("line")
      .filter(MathDsl.compile(raw"line RLIKE '^\d+$$'"))
      .collect().map(_.getString(0)).toSeq == Seq("123"))
    assert(MathDsl.compile("contains(line, 'above')") ==
      "contains(line, 'above')")
    assert(MathDsl.compile("concat('i2:', line)") == "concat('i2:', line)")
    assert(MathDsl.compile("contains(line, 'from a to b')") ==
      "contains(line, 'from a to b')")
    // rewrites still apply OUTSIDE the literals, including '' escapes
    assert(MathDsl.compile("i0 above 2 and contains(line, 'it''s above')") ==
      "TRY_CAST(try_element_at(__f, 1) AS DOUBLE) > 2 " +
        "and contains(line, 'it''s above')")
    // a caret whose parenthesized operand SPANS a literal must still
    // balance (the first quote-aware attempt rewrote per between-quote
    // segment, so the paren scan saw only ")) ^ 2" and threw)
    assert(MathDsl.compile("(i0 + length('ab')) ^ 2") ==
      "pow((TRY_CAST(try_element_at(__f, 1) AS DOUBLE) + length('ab')), 2)")
    assert(eval("(i0 + length('ab')) ^ 2", Seq(3.0)) == 25.0)
  }

  test("power operator: rtvals operands, chaining, parenthesized bases") {
    // round-11 review findings: the caret regex could not match a
    // rewritten rtvals ref ({i:x} ^ 2 left a literal '^' = integer XOR,
    // a silent wrong number), and its fixpoint re-matched an emitted
    // pow's argument list on chained powers (2^3^2 -> powpow((2,3),2))
    assert(MathDsl.compile("{i:count} ^ 2") == "pow(__rt_i_count, 2)")
    assert(eval("2 ^ 3 ^ 2", Seq.empty) == 64.0) // left-associative
    assert(eval("(1+2) ^ 2", Seq.empty) == 9.0)
    assert(eval("2 ^ (1+2)", Seq.empty) == 8.0)
    assert(eval("(2*(1+1)) ^ 2", Seq.empty) == 16.0) // nested parens
    assert(eval("i0 ^ 2 + 1", Seq(3.0)) == 10.0)
    intercept[IllegalArgumentException] { MathDsl.compile("^ 2") }
  }
}

class PathCompilerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val path = PathSpec(
    id = "ctd",
    steps = Seq(
      FilterStep(Seq("i0 above 0", "line NOT LIKE '#%'")),
      MathStep(Seq(1 -> "i1 * 10 + i0")),
      EditStep(Seq("concat('ctd,', line)")),
      StoreStep(Seq(
        ("temp", 1, "double", "-999.0"),
        ("depth", 2, "double", "-999.0"),
        ("station", 3, "string", "'unknown'")))))

  test("path compiles filter -> math -> edit -> store with reject branch") {
    val in = Seq("2.0,3.5,44", "#comment,1,2", "-1.0,9,9").toDF("line")
    val (out, reject) = PathCompiler.compileWithReject(path, in)
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows(0)
    // math wrote back i1 = 3.5*10 + 2.0 = 37.0; edit prepended "ctd,"
    assert(r.getAs[String]("line") == "ctd,2.0,37.0,44")
    assert(r.getAs[Double]("temp") == 2.0)    // shifted by the edit prefix
    assert(r.getAs[Double]("depth") == 37.0)
    assert(r.getAs[String]("station") == "44")
    assert(reject.count() == 2)
  }

  test("store defaults apply on parse failure") {
    val bad = Seq("5.0,notanumber,x").toDF("line")
    val out = PathCompiler.compile(path.copy(steps = path.steps.filter {
      case _: StoreStep => true; case _ => false
    }), bad)
    assert(out.select("temp").collect()(0).getDouble(0) == -999.0)
  }

  test("math write-back: null results keep the field, high targets pad") {
    // a null op result (TRY_CAST of junk) must write an EMPTY field —
    // array_join silently drops nulls, which deleted the field and
    // shifted every later one; a target beyond the field count pads so
    // the value lands AT its index, not wherever the line ended
    val p = PathSpec("m", steps = Seq(MathStep(Seq(1 -> "i1 * 2"))))
    val in = Seq("5.0,junk,z").toDF("line")
    val out = PathCompiler.compile(p, in).collect()(0).getAs[String]("line")
    assert(out == "5.0,,z", s"null write-back must keep the slot: '$out'")
    val pHigh = PathSpec("m2", steps = Seq(MathStep(Seq(4 -> "i0 + 1"))))
    val outH = PathCompiler.compile(pHigh, Seq("1.0,2.0").toDF("line"))
      .collect()(0).getAs[String]("line")
    assert(outH == "1.0,2.0,,,2.0", s"high target must pad to its index: '$outH'")
  }

  test("store must be the path's last step") {
    val bad = PathSpec("s", steps = Seq(
      StoreStep(Seq(("a", 0, "double", "0.0"))),
      FilterStep(Seq("i0 above 0"))))
    val e = intercept[IllegalArgumentException] {
      PathCompiler.compile(bad, Seq("1.0").toDF("line"))
    }
    assert(e.getMessage.contains("LAST step"))
  }

  test("rtvals: all three kind refs resolve; missing keys compile to null") {
    // {i:x}/{f:x} previously failed analysis (the pivot renamed with
    // kind 'r' only), and a key with no state row yet crashed the path
    // at startup instead of evaluating null
    val rt = Seq(("temp", 20.0)).toDF("key", "value")
    val p = PathSpec("rv", steps = Seq(
      MathStep(Seq(1 -> "{i:temp} + {r:temp}")),
      FilterStep(Seq("coalesce({f:missing}, 1) above 0"))))
    val out = PathCompiler.compileWithRtVals(p,
      Seq("1.0,0").toDF("line"), rt).collect()
    assert(out.length == 1)
    assert(out(0).getAs[String]("line") == "1.0,40.0")
  }

  test("streaming: file replay through the same path spec") {
    val dir = Files.createTempDirectory("graft-replay").toFile
    Files.writeString(new java.io.File(dir, "a.txt").toPath,
      "2.0,3.5,44\n#c,0,0\n1.0,1.0,7\n")
    val src = LineSources.fileReplay(spark, dir.getAbsolutePath).drop("origin", "ts")
    val out = PathCompiler.compile(path, src)
    val q = out.writeStream.format("memory").queryName("replay_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("replay_out").orderBy("temp").collect()
      assert(got.length == 2)
      assert(got.map(_.getAs[Double]("depth")).toSeq == Seq(11.0, 37.0))
    } finally q.stop()
  }
}

class RtValsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("madGate: streaming MAD anomaly twin tracks the batch medians across batches") {
    // streaming twin of the batch ts_anomaly_mad oracle row
    // (StateQueries.scala): same 3 × 1.4826 × MAD gate, medians as
    // bounded remedian sketches instead of exact two-pass medians
    import graft.streaming.{MadPoint, Sketches}
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val q = Sketches.madGate(mem.toDS(), warmup = 30)
      .writeStream.format("memory").queryName("mad_out")
      .outputMode("update").start()
    try {
      // values 10 + (i mod 7 - 3): uniform over 7..13 → exact median 10,
      // exact MAD 2 (gate threshold 2 · 1.4826 · 3 ≈ 8.9)
      val base = (0 until 63).map(i => ("s1", 10.0 + (i % 7) - 3))
      mem.addData(base: _*)
      q.processAllAvailable()
      // second batch: state must carry — the gate is already armed, so
      // the gross outliers flag immediately while normals pass
      val tail = (0 until 21).map(i => ("s1", 10.0 + (i % 7) - 3)) ++
        Seq(("s1", 1000.0), ("s1", -500.0), ("s1", 11.0))
      mem.addData(tail: _*)
      q.processAllAvailable()
      val rows = spark.table("mad_out").as[MadPoint].collect().sortBy(_.n)
      val last = rows.last
      assert(rows.map(_.n).distinct.length == rows.length, "n must be cumulative")
      // remedian estimates land on the true medians for this symmetric
      // fixture (within one buffer collapse)
      assert(math.abs(last.med - 10.0) <= 1.0, s"median estimate drifted: ${last.med}")
      assert(math.abs(last.mad - 2.0) <= 1.0, s"MAD estimate drifted: ${last.mad}")
      val flagged = rows.filter(_.anomaly).map(_.value).toSet
      assert(flagged.contains(1000.0) && flagged.contains(-500.0),
        s"gross outliers not flagged: $flagged")
      // no normal in-range value may trip the armed gate
      assert(flagged.forall(v => v > 100 || v < -100), s"false positives: $flagged")
    } finally q.stop()
  }

  test("streamingLshCandidates: banded index in keyed state pairs across batches") {
    // streaming twin of the batch dd_incremental probe-vs-index: the
    // bucket state must carry so a doc arriving BATCHES LATER still
    // pairs with its near-dup, and the candidate set must agree with
    // the batch lshCandidatePairs on the same corpus
    import graft.streaming.Sketches
    implicit val sc = spark.sqlContext
    val dupText = "the quick brown fox jumps over the lazy dog again and again"
    val otherText = "completely different words about marine salinity sensors here"
    val mem = MemoryStream[(Long, String)]
    val q = Sketches.streamingLshCandidates(
      mem.toDS().toDF("doc_id", "text"), "doc_id", "text")
      .writeStream.format("memory").queryName("lsh_cand")
      .outputMode("append").start()
    try {
      mem.addData((1L, dupText), (2L, otherText))
      q.processAllAvailable()
      assert(spark.table("lsh_cand").isEmpty, "no near-dups yet")
      mem.addData((3L, dupText)) // later batch: must pair against state
      q.processAllAvailable()
      val pairs = spark.table("lsh_cand").collect()
        .map(r => (r.getAs[Long]("docA"), r.getAs[Long]("docB"))).distinct
      assert(pairs.toSeq == Seq((1L, 3L)), s"got ${pairs.toSeq}")
      val batch = graft.operators.TextOps.lshCandidatePairs(
        Seq((1L, dupText), (2L, otherText), (3L, dupText)).toDF("doc_id", "text"),
        "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(batch == Seq((1L, 3L)), s"batch disagrees: $batch")
    } finally q.stop()
  }

  test("streamingExactDedup: first key claimant wins across batches") {
    import graft.streaming.{DedupDecision, Sketches}
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = Sketches.streamingExactDedup(
      mem.toDS().toDF("doc_id", "key"), "doc_id", "key")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData((5L, "A"), (1L, "A"), (2L, "B"))
      q.processAllAvailable()
      mem.addData((9L, "A"), (3L, "C")) // later batch: keeper must persist
      q.processAllAvailable()
      val rows = spark.table("dedup_out").as[DedupDecision].collect()
        .map(d => (d.id, d.key, d.keep, d.keeper)).sortBy(_._1)
      // in-batch order is id-sorted, so 1 claims A and 5 is its dup —
      // the same decision the batch keeper window makes
      assert(rows.toSeq == Seq(
        (1L, "A", true, 1L), (2L, "B", true, 2L), (3L, "C", true, 3L),
        (5L, "A", false, 1L), (9L, "A", false, 1L)), s"got ${rows.toSeq}")
    } finally q.stop()
  }

  test("snapshots maintain last/min/max/count/avg/stddev across batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[ValUpdate]
    val q = RtVals.snapshots(mem.toDS())
      .writeStream.format("memory").queryName("rt_snap").outputMode("update").start()
    try {
      mem.addData(ValUpdate("t1", 10.0, 1), ValUpdate("t1", 20.0, 2), ValUpdate("t2", 5.0, 1))
      q.processAllAvailable()
      mem.addData(ValUpdate("t1", 30.0, 3))
      q.processAllAvailable()
      val t1 = spark.table("rt_snap").filter($"key" === "t1")
        .orderBy($"count".desc).as[graft.streaming.ValSnapshot].collect()(0)
      assert(t1.last == 30.0 && t1.min == 10.0 && t1.max == 30.0 && t1.count == 3)
      assert(math.abs(t1.avg - 20.0) < 1e-12)
      assert(math.abs(t1.stddev.get - 10.0) < 1e-12)
      assert(t1.lastTs == 3)
    } finally q.stop()
  }

  test("space-saving heavy hitters: bounded state, est >= true >= est - err") {
    import graft.streaming.{HeavyHitter, Sketches}
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[String]
    // one shard, capacity 4 << distinct items: evictions must happen
    val q = Sketches.spaceSavingTopK(mem.toDS(), shards = 1, capacity = 4, k = 4)
      .writeStream.format("memory").queryName("hh_out").outputMode("update").start()
    try {
      val batch1 = Seq.fill(30)("hot") ++ Seq.fill(10)("warm") ++
        Seq("c1", "c2", "c3", "c4", "c5")
      val batch2 = Seq.fill(20)("hot") ++ Seq.fill(8)("warm") ++ Seq("c6", "c7")
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // last emission per item (update mode re-emits; take max est)
      val got = spark.table("hh_out").as[HeavyHitter].collect()
        .groupBy(_.item).map { case (w, hs) => w -> hs.maxBy(_.est) }
      val hot = got("hot"); val warm = got("warm")
      // space-saving guarantee: est >= true count >= est - err
      assert(hot.est >= 50 && hot.est - hot.err <= 50, s"hot bounds: $hot")
      assert(warm.est >= 18 && warm.est - warm.err <= 18, s"warm bounds: $warm")
      // the two genuinely heavy items were never evicted
      assert(hot.err == 0 && warm.err == 0, s"heavy items took evictions: $hot $warm")
    } finally q.stop()
  }

  test("streaming HLL: cross-batch registers, exact-union merge, estimate envelope") {
    import graft.streaming.{HllShard, Sketches}
    implicit val sc = spark.sqlContext
    val p = 12
    val mem = MemoryStream[String]
    val q = Sketches.hllDistinct(mem.toDS(), shards = 2, p = p)
      .writeStream.format("memory").queryName("hll_out").outputMode("update").start()
    try {
      // 3 batches, heavy duplication across batches: 600 distinct keys
      val keys = (0 until 600).map(i => s"key-$i")
      mem.addData(keys.take(300) ++ keys.take(100): _*)
      q.processAllAvailable()
      mem.addData(keys.slice(200, 500): _*)
      q.processAllAvailable()
      mem.addData(keys.slice(400, 600) ++ keys.take(50): _*)
      q.processAllAvailable()
      val regs = spark.table("hll_out").as[HllShard].collect().map(_.regs)
      val est = Sketches.hllEstimate(Sketches.mergeHllRegisters(regs.toSeq, p), p)
      // linear-counting regime at 600 << 2^12: a few percent of error
      assert(math.abs(est - 600) <= 60, s"estimate $est vs 600")
      // duplicates must not inflate: replaying batch 1 changes nothing
      mem.addData(keys.take(300): _*)
      q.processAllAvailable()
      val regs2 = spark.table("hll_out").as[HllShard].collect().map(_.regs)
      val est2 = Sketches.hllEstimate(Sketches.mergeHllRegisters(regs2.toSeq, p), p)
      assert(est2 == est, s"duplicate replay moved the estimate: $est2 != $est")
      // merging every update-mode emission == merging the final states
      // (register growth is monotone) — the property the board row uses
    } finally q.stop()
  }

  test("bloom novelty: duplicates never flagged novel, state survives batches") {
    import graft.streaming.{NovelItem, Sketches}
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[String]
    // 4096 bits for ~6 distinct items: FP (novel missed) probability ~0
    val q = Sketches.bloomNovelty(mem.toDS(), shards = 2, nBits = 4096, nHashes = 4)
      .writeStream.format("memory").queryName("nov_out").outputMode("update").start()
    try {
      mem.addData("a", "b", "c", "a")
      q.processAllAvailable()
      val b1 = spark.table("nov_out").as[NovelItem].collect()
      // first sighting novel; the in-batch repeat of "a" is not
      assert(b1.count(_.item == "a") == 2)
      assert(b1.filter(_.item == "a").count(_.novel) == 1, b1.mkString(","))
      assert(b1.filter(_.item == "b").forall(_.novel))
      assert(b1.filter(_.item == "c").forall(_.novel))
      // cross-batch: b and c are remembered by state, d is new
      mem.addData("b", "c", "d")
      q.processAllAvailable()
      val b2 = spark.table("nov_out").as[NovelItem].collect().drop(b1.length)
      assert(b2.filter(_.item == "b").forall(!_.novel), b2.mkString(","))
      assert(b2.filter(_.item == "c").forall(!_.novel), b2.mkString(","))
      assert(b2.filter(_.item == "d").forall(_.novel), b2.mkString(","))
    } finally q.stop()
  }

  test("cep sequence matcher: A->B->C within bounds, across batch boundaries") {
    import graft.streaming.{Cep, SeqEvent, SeqMatch}
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SeqEvent]
    val q = Cep.sequenceMatches(mem.toDS(), "a", "b", "c", stepMillis = 100)
      .writeStream.format("memory").queryName("cep_out").outputMode("append").start()
    try {
      // k1: clean chain split across two batches; k2: B arrives too late
      mem.addData(
        SeqEvent("k1", "a", 10), SeqEvent("k1", "x", 20), SeqEvent("k1", "b", 50),
        SeqEvent("k2", "a", 10))
      q.processAllAvailable()
      mem.addData(
        SeqEvent("k1", "c", 120),   // within 100 of b@50 -> match
        SeqEvent("k2", "b", 500),   // > a+100: never anchors
        SeqEvent("k2", "c", 510))
      q.processAllAvailable()
      // k1 restarts after its match: a fresh chain matches again
      mem.addData(
        SeqEvent("k1", "a", 1000), SeqEvent("k1", "b", 1010), SeqEvent("k1", "c", 1020))
      q.processAllAvailable()
      val got = spark.table("cep_out").as[SeqMatch].collect().sortBy(_.sTs).toSeq
      assert(got == Seq(SeqMatch("k1", 10, 50, 120), SeqMatch("k1", 1000, 1010, 1020)),
        s"unexpected matches: $got")
    } finally q.stop()
  }

  test("ewma smooths across batches, seeded with the first observation") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[ValUpdate]
    val q = RtVals.ewma(mem.toDS(), alpha = 0.3)
      .writeStream.format("memory").queryName("rt_ewma").outputMode("update").start()
    try {
      mem.addData(ValUpdate("k", 10.0, 1), ValUpdate("k", 20.0, 2))
      q.processAllAvailable()
      mem.addData(ValUpdate("k", 30.0, 3))
      q.processAllAvailable()
      val snap = spark.table("rt_ewma").filter($"key" === "k")
        .orderBy($"count".desc).as[graft.streaming.EwmaSnapshot].collect()(0)
      // fold: 10 -> 0.7*10+0.3*20 = 13 -> 0.7*13+0.3*30 = 18.1 (state
      // carries across the batch boundary)
      assert(math.abs(snap.ewma - 18.1) < 1e-12)
      assert(snap.count == 3 && snap.lastTs == 3)
    } finally q.stop()
  }

  test("alerts: rising fires once until cleared below low (hysteresis)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[ValUpdate]
    val q = RtVals.alerts(mem.toDS(), high = 100, low = 20, emitChanged = false)
      .writeStream.format("memory").queryName("rt_alerts").outputMode("append").start()
    try {
      mem.addData(
        ValUpdate("k", 50, 1), ValUpdate("k", 120, 2),  // rising
        ValUpdate("k", 150, 3),                          // still high: no fire
        ValUpdate("k", 10, 4),                           // cleared
        ValUpdate("k", 130, 5))                          // rising again
      q.processAllAvailable()
      val got = spark.table("rt_alerts").orderBy("ts")
        .as[graft.streaming.ValAlert].collect().map(a => (a.kind, a.ts)).toSeq
      assert(got == Seq(("rising", 2L), ("cleared", 4L), ("rising", 5L)))
    } finally q.stop()
  }

  test("windowed agg with watermark over file-replayed event time") {
    // event-time replay: recorded ts column drives the window, late rows
    // beyond the watermark are dropped (SURVEY §2.8 late-data stance)
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"))
      .agg(count("*").as("n"), sum($"v").as("s"))
    val q = agg.writeStream.format("memory").queryName("win_out")
      .outputMode("update").start()
    try {
      def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      mem.addData((t(1), 1.0), (t(2), 2.0), (t(7), 10.0))
      q.processAllAvailable()
      val rows = spark.table("win_out").collect()
      assert(rows.map(_.getAs[Long]("n")).sum == 3)
    } finally q.stop()
  }
}

class SinkSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rolling file sink writes time-partitioned directories") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val out = Files.createTempDirectory("graft-roll").toFile.getAbsolutePath
    val ckpt = Files.createTempDirectory("graft-ckpt").toFile.getAbsolutePath
    val df = mem.toDF().toDF("ts", "line")
    val q = LineSinks.rollingFiles(df, out, rollPattern = "yyyy-MM-dd_HH")
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-03-01 10:15:00"), "a"),
        (java.sql.Timestamp.valueOf("2024-03-01 11:20:00"), "b"))
      q.processAllAvailable()
      val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName).sorted
      assert(dirs.contains("roll=2024-03-01_10") && dirs.contains("roll=2024-03-01_11"))
    } finally q.stop()
  }
}

class ResetEpochSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("group reset starts a new aggregation epoch across batches") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[ValUpdate]
    val q = RtVals.snapshotsWithReset(mem.toDS(), u => u.value < 0)
      .writeStream.format("memory").queryName("reset_out")
      .outputMode("update").start()
    try {
      mem.addData(ValUpdate("a", 5.0, 1), ValUpdate("a", 9.0, 2))
      q.processAllAvailable()
      mem.addData(ValUpdate("a", -1.0, 3), ValUpdate("a", 2.0, 4)) // reset marker
      q.processAllAvailable()
      val last = spark.table("reset_out").as[EpochSnapshot].collect()
        .maxBy(_.lastTs)
      // epoch 1 contains the marker (-1) and 2.0 only — 5.0/9.0 are gone
      assert(last.epoch == 1L && last.count == 2L &&
        last.min == -1.0 && last.max == 2.0 && last.last == 2.0,
        s"got $last")
    } finally q.stop()
  }
}

class IdleAlertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stream TTL: idle fires after event-time gap, !idle on recovery") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[ValUpdate]
    val q = RtVals.idleAlerts(mem.toDS(), ttlMillis = 10000)
      .writeStream.format("memory").queryName("idle_out").outputMode("append").start()
    try {
      mem.addData(ValUpdate("a", 1.0, 1000), ValUpdate("a", 2.0, 2000))
      q.processAllAvailable()                       // watermark -> 2000
      mem.addData(ValUpdate("b", 0.0, 500000))
      q.processAllAvailable()                       // watermark -> 500000
      mem.addData(ValUpdate("b", 0.0, 600000))
      q.processAllAvailable()                       // a's timeout (12000) fires
      mem.addData(ValUpdate("a", 3.0, 700000))
      q.processAllAvailable()                       // a recovers
      val got = spark.table("idle_out").filter($"key" === "a")
        .orderBy("ts").as[graft.streaming.ValAlert].collect()
        .map(a => (a.kind, a.ts)).toSeq
      assert(got == Seq(("idle", 12000L), ("!idle", 700000L)), s"got $got")
    } finally q.stop()
  }
}

class StreamJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("stream-static broadcast enrichment join") {
    implicit val sc = spark.sqlContext
    val dim = Seq((13L, "gold"), (12L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Long, Double)]
    val joined = mem.toDF().toDF("user_id", "value")
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("user_id"), "left")
    val q = joined.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData((13L, 1.0), (99L, 2.0))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getLong(0), Option(r.getAs[String]("tier")))).toSet
      assert(rows == Set((13L, Some("gold")), (99L, None)))
    } finally q.stop()
  }

  test("label dispatch: one source fans out to filtered sinks (§2.9)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val src = mem.toDF().toDF("label", "line")
    val qA = src.filter($"label" === "real").writeStream
      .format("memory").queryName("sink_real").outputMode("append").start()
    val qB = src.filter($"label" === "text").writeStream
      .format("memory").queryName("sink_text").outputMode("append").start()
    try {
      mem.addData(("real", "1.5"), ("text", "hello"), ("real", "2.5"))
      qA.processAllAvailable(); qB.processAllAvailable()
      assert(spark.table("sink_real").count() == 2)
      assert(spark.table("sink_text").count() == 1)
    } finally { qA.stop(); qB.stop() }
  }
}

class TypedRtValsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.streaming.{RtVals, TypedUpdate}

  test("typed state: real/int/text/flag vals in one keyed stream") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[TypedUpdate]
    val q = RtVals.typedSnapshots(mem.toDS())
      .writeStream.format("memory").queryName("rt_typed").outputMode("update").start()
    try {
      mem.addData(
        TypedUpdate("deck_temp", "real", 19.2, "", 1),
        TypedUpdate("deck_temp", "real", 21.5, "", 2),
        TypedUpdate("n_samples", "int", 42, "", 1),
        TypedUpdate("station", "text", 0, "st01", 1),
        TypedUpdate("pump_on", "flag", 0, "HIGH", 1))
      q.processAllAvailable()
      val snap = spark.table("rt_typed").as[graft.streaming.TypedSnapshot]
        .collect().map(s => s.key -> s).toMap
      assert(snap("deck_temp").lastNum.contains(21.5))
      assert(snap("deck_temp").min.contains(19.2) && snap("deck_temp").max.contains(21.5))
      assert(snap("n_samples").lastNum.contains(42.0))
      assert(snap("station").lastText.contains("st01"))
      assert(snap("pump_on").lastFlag.contains(true))
      mem.addData(TypedUpdate("pump_on", "flag", 0, "off", 2))
      q.processAllAvailable()
      val p = spark.table("rt_typed").filter($"key" === "pump_on")
        .orderBy($"lastTs".desc).as[graft.streaming.TypedSnapshot].collect()(0)
      assert(p.lastFlag.contains(false) && p.count == 2)
    } finally q.stop()
  }
}

class StreamDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming dedup within watermark drops re-deliveries") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val deduped = mem.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      mem.addData(("a", t(1)), ("a", t(2)), ("b", t(3)))
      q.processAllAvailable()
      mem.addData(("a", t(4)), ("c", t(5)))   // 'a' re-delivered inside watermark
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getString(0)).sorted.toSeq
      assert(ids == Seq("a", "b", "c"), s"got $ids")
    } finally q.stop()
  }

  test("rolling file sink decimation keeps exactly 1-in-N by arrival order") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val out = java.nio.file.Files.createTempDirectory("graft-dec").toFile.getAbsolutePath
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dec-ck").toFile.getAbsolutePath
    val q = LineSinks.rollingFiles(mem.toDF().toDF("ts", "line"), out,
      decimation = 4)
      .option("checkpointLocation", ckpt).start()
    try {
      val base = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
      mem.addData((1 to 400).map(i => (base, s"row$i")): _*)
      q.processAllAvailable()
      // global deterministic 1-in-N, never hash noise
      val kept = spark.read.option("header", "true").csv(out).count()
      assert(kept == 100, s"kept $kept of 400")
      // the counter carries ACROSS micro-batches (reference skipCount
      // semantics): three 2-row batches continue the 401.. numbering, so
      // exactly one of them (row 404) lands — a per-batch counter would
      // emit nothing from batches smaller than the decimation
      for (b <- 0 until 3) {
        mem.addData((1 to 2).map(i => (base, s"late$b-$i")): _*)
        q.processAllAvailable()
      }
      val kept2 = spark.read.option("header", "true").csv(out).count()
      assert(kept2 == 101, s"kept $kept2 of 406")
    } finally q.stop()
  }
}

class RuleEngineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.streaming.{RuleEngine, TaskRule, ValUpdate}

  test("task rules fire when guards over rtvals state hold") {
    implicit val sc = spark.sqlContext
    val rules = Seq(
      TaskRule("hot", "key = 'temp' AND last > 30", "fan:on"),
      TaskRule("many", "count >= 3", "log:flood"))
    val fired = scala.collection.mutable.ArrayBuffer.empty[graft.streaming.FiredCommand]
    val mem = MemoryStream[ValUpdate]
    val q = RuleEngine.run(RtVals.snapshots(mem.toDS()), rules)(fired ++= _)
      .outputMode("update").start()
    try {
      mem.addData(ValUpdate("temp", 25.0, 1), ValUpdate("hum", 60.0, 1))
      q.processAllAvailable()
      assert(fired.isEmpty)
      mem.addData(ValUpdate("temp", 31.5, 2))
      q.processAllAvailable()
      assert(fired.map(f => (f.ruleId, f.key, f.command)).toSet ==
        Set(("hot", "temp", "fan:on")))
      fired.clear()
      mem.addData(ValUpdate("temp", 32.0, 3))
      q.processAllAvailable()
      // still hot AND now count=3 -> both rules fire this batch
      assert(fired.map(_.ruleId).toSet == Set("hot", "many"))
    } finally q.stop()
  }
}

class RtValsRefSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("{r:id} references resolve from a broadcast state table") {
    val state = Seq(("gain", 2.5), ("offset", 10.0)).toDF("key", "value")
    val spec = PathSpec("cal", ",", Seq(
      FilterStep(Seq("i0 above {r:offset}")),   // only rows above current offset
      MathStep(Seq(0 -> "i0 * {r:gain} + {r:offset}")),
      StoreStep(Seq(("v", 0, "double", "-1.0")))))
    val out = PathCompiler.compileWithRtVals(
      spec, Seq("20.0", "5.0").toDF("line"), state)
    val rows = out.collect()
    assert(rows.length == 1)                     // 5.0 <= offset filtered out
    assert(rows(0).getAs[Double]("v") == 20.0 * 2.5 + 10.0)
  }

  test("timed literal source emits the constant line") {
    val src = LineSources.timed(spark, "ping,1", rowsPerSecond = 50)
    val q = src.writeStream.format("memory").queryName("timed_out")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        n = spark.table("timed_out").count()
      }
      assert(n > 0, "rate source emitted nothing in 15s")
      assert(spark.table("timed_out").select("line").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("ping,1"))
    } finally q.stop()
  }

  test("utm_to_gdc column API inverts gdc_to_utm") {
    import graft.functions.GraftFunctions._
    import org.apache.spark.sql.functions._
    val df = Seq((51.05, 3.72)).toDF("lat", "lon")
      .withColumn("utm", gdc_to_utm(col("lat"), col("lon")))
      .withColumn("back", utm_to_gdc(col("utm.easting"), col("utm.northing"),
        col("utm.zone"), col("utm.north")))
    val r = df.select("back.lat", "back.lon").collect()(0)
    assert(math.abs(r.getDouble(0) - 51.05) < 1e-6)
    assert(math.abs(r.getDouble(1) - 3.72) < 1e-6)
  }
}

/** S8 runtime proof: the JDBC replay source actually executing against an
  * embedded Derby database (PathForward.java:516-537 SQLITE custom-src
  * semantics — run SELECT once, replay rows at the rate source's pace).
  */
class JdbcReplaySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("S8 jdbc replay streams query rows as ;-joined lines (embedded Derby)") {
    val dbDir = Files.createTempDirectory("graft-derby").toFile.getAbsolutePath + "/db"
    val url = s"jdbc:derby:$dbDir;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE readings (id INT, val DOUBLE)")
      (1 to 5).foreach(i => st.executeUpdate(s"INSERT INTO readings VALUES ($i, ${i * 1.5})"))
      st.close()
    } finally conn.close()
    val df = LineSources.jdbcReplay(
      spark, url, "SELECT id, val FROM readings ORDER BY id", rowsPerSecond = 100)
    val q = df.writeStream.format("memory").queryName("jdbc_replay")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < 5 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table("jdbc_replay").count()
        if (n < 5) Thread.sleep(200)
      }
      val lines = spark.table("jdbc_replay").collect()
        .map(_.getAs[String]("line")).toSet
      assert(lines == (1 to 5).map(i => s"$i;${i * 1.5}").toSet, s"got $lines")
    } finally q.stop()
  }
}
