package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Cep, EnrichEvent, RtVals, TypedUpdate, ValUpdate}

/** Regression pins for the round-13 state-plane review wave
  * (Cep/RtVals/Ranks/SpaceSaving) — each test encodes a contract the
  * review found claimed-but-unenforced or silently violated.
  */
class StatePlaneContractsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("asOfEnrich: ties-to-largest-(ts,id) holds across micro-batch boundaries") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[EnrichEvent]
    val q = Cep.asOfEnrich(mem.toDS(), "dim", "query")
      .toDF().writeStream.format("memory").queryName("asof_xbatch")
      .outputMode("append").start()
    try {
      // batch 1: dim(ts=5, id=9); batch 2: dim(ts=5, id=3) then query.
      // AsOfJoinExec's rule: among equal-ts dims the LARGEST id wins —
      // pre-fix the later batch's smaller id overwrote state and won.
      mem.addData(EnrichEvent("k", "dim", 5L, 9L))
      q.processAllAvailable()
      mem.addData(EnrichEvent("k", "dim", 5L, 3L),
        EnrichEvent("k", "query", 6L, 100L))
      q.processAllAvailable()
      val got = spark.table("asof_xbatch").collect()
        .map(r => (r.getAs[Long]("queryId"), r.getAs[Long]("matchId")))
      assert(got.toSeq == Seq((100L, 9L)),
        s"equal-ts dim from a later batch must not displace the larger id: ${got.toSeq}")
    } finally q.stop()
  }

  test("RtVals: NaN updates prove liveness but never poison the stats") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[ValUpdate]
    val q = RtVals.snapshots(mem.toDS())
      .toDF().writeStream.format("memory").queryName("rtv_nan")
      .outputMode("update").start()
    try {
      mem.addData(ValUpdate("s", 10.0, 1L), ValUpdate("s", 20.0, 2L),
        ValUpdate("s", Double.NaN, 3L), ValUpdate("s", 30.0, 4L))
      q.processAllAvailable()
      val r = spark.table("rtv_nan").collect().last
      assert(r.getAs[Double]("last") == 30.0)
      assert(r.getAs[Double]("min") == 10.0 && r.getAs[Double]("max") == 30.0,
        "NaN leaked into min/max")
      assert(r.getAs[Long]("count") == 3L, "count must track real samples")
      assert(!r.getAs[Double]("avg").isNaN, "NaN poisoned the Welford mean")
      assert(r.getAs[Long]("lastTs") == 4L)
    } finally q.stop()
  }

  test("typedSnapshots: null text neither NPEs nor corrupts the flag parse") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[TypedUpdate]
    val q = RtVals.typedSnapshots(mem.toDS())
      .toDF().writeStream.format("memory").queryName("rtv_nulltext")
      .outputMode("update").start()
    try {
      // two real updates with equal (ts, kind) and null text exercise
      // the tuple ordering's text compare (pre-fix: NPE mid-batch), and
      // a null-text flag exercises the trim dereference
      mem.addData(TypedUpdate("r", "real", 1.0, null, 5L),
        TypedUpdate("r", "real", 2.0, null, 5L),
        TypedUpdate("f", "flag", 0.0, null, 5L))
      q.processAllAvailable()
      val rows = spark.table("rtv_nulltext").collect()
        .map(r => r.getAs[String]("key") -> r).toMap
      assert(rows("r").getAs[Long]("count") == 2L)
      assert(rows("f").getAs[Boolean]("lastFlag") == false,
        "null flag text must parse as falsy, not NPE")
    } finally q.stop()
  }

  test("idleAlerts refuses ttl <= 0; sequenceMatches refuses negative event ts") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[ValUpdate]
    intercept[IllegalArgumentException] {
      RtVals.idleAlerts(mem.toDS(), ttlMillis = 0L)
    }
  }

  test("bucketedPrefixSum: all-NULL within-bucket prefix carries the prior buckets' total") {
    import org.apache.spark.sql.functions.col
    // bucket 0 holds value 10; bucket 1's row has a NULL value. The
    // window-sum oracle returns 10 at that row; pre-fix the helper
    // returned NULL (10 + NULL). A fully-NULL global prefix stays NULL.
    val df = Seq[(Int, Integer, Int)]((0, 10, 1), (1, null.asInstanceOf[Integer], 2))
      .toDF("bkt", "v", "ord")
    val got = graft.operators.Ranks
      .bucketedPrefixSum(df, Seq.empty, "bkt", "v", Seq(col("ord")), "cum")
      .orderBy("ord").collect().map(r =>
        if (r.isNullAt(r.fieldIndex("cum"))) None else Some(r.getLong(r.fieldIndex("cum"))))
    assert(got.toSeq == Seq(Some(10L), Some(10L)),
      s"window-sum NULL semantics diverged: ${got.toSeq}")
    // leading all-NULL prefix: NULL like the oracle
    val df2 = Seq[(Int, Integer, Int)]((0, null.asInstanceOf[Integer], 1), (1, 7, 2))
      .toDF("bkt", "v", "ord")
    val got2 = graft.operators.Ranks
      .bucketedPrefixSum(df2, Seq.empty, "bkt", "v", Seq(col("ord")), "cum")
      .orderBy("ord").collect().map(r =>
        if (r.isNullAt(r.fieldIndex("cum"))) None else Some(r.getLong(r.fieldIndex("cum"))))
    assert(got2.toSeq == Seq(None, Some(7L)), s"leading-NULL prefix: ${got2.toSeq}")
  }

  test("ConfirmCollector: a throwing send fails the confirm instead of wedging the FIFO") {
    import graft.streaming.ConfirmCollector
    import scala.concurrent.Await
    import scala.concurrent.duration._
    // send always throws (dead TCP peer): pre-fix the exception escaped
    // before the retry was scheduled, the head confirm hung forever and
    // every later confirm queued behind it
    val c = new ConfirmCollector(
      send = _ => throw new java.io.IOException("peer gone"),
      maxAttempts = 2, timeoutSeconds = 1)
    val f1 = c.addConfirm("stop", "ack")
    assert(!Await.result(f1, 10.seconds), "confirm must fail, not hang")
    // the queue advanced: a second confirm gets its own verdict
    val f2 = c.addConfirm("go", "ok")
    assert(!Await.result(f2, 10.seconds))
    assert(c.pending == 0)
  }

  test("BufferCollector refuses the never-finishing default configuration") {
    import graft.streaming.BufferCollector
    intercept[IllegalArgumentException] {
      new BufferCollector(onFinished = (_, _) => ())
    }
  }

  test("nextClockDelayMs rounds UP: the tick never fires before the target") {
    import java.time.{Instant, LocalTime}
    import graft.streaming.TaskScheduler
    // now has sub-millisecond precision; pre-fix Duration.toMillis
    // truncated, firing ~1 ms early — and the re-arm then computed a
    // 0 ms delay back to the SAME occurrence (tight dispatch loop)
    val now = Instant.parse("2026-01-01T10:00:00.000300Z")
    val d = TaskScheduler.nextClockDelayMs(
      LocalTime.of(18, 0), Set.empty, utc = true, now)
    val fireAt = now.plusMillis(d)
    val target = Instant.parse("2026-01-01T18:00:00Z")
    assert(!fireAt.isBefore(target), s"fires ${fireAt} before target $target")
    assert(d <= 8L * 3600 * 1000, "rounded more than the remainder")
    // exact-millisecond now keeps the exact delay (no gratuitous +1)
    val exact = Instant.parse("2026-01-01T10:00:00Z")
    assert(TaskScheduler.nextClockDelayMs(
      LocalTime.of(18, 0), Set.empty, utc = true, exact) == 8L * 3600 * 1000)
  }

  test("MQTT codec refuses malformed varints, truncated publishes, oversized strings") {
    import graft.sources.MqttCodec
    import java.io.{ByteArrayInputStream, DataInputStream}
    def din(bytes: Int*): DataInputStream =
      new DataInputStream(new ByteArrayInputStream(bytes.map(_.toByte).toArray))
    // 5 continuation bytes violate MQTT-2.2.3 (pre-fix: Int overflow /
    // unbounded loop / 256 MB allocation per crafted packet)
    intercept[java.io.IOException] {
      MqttCodec.readPacket(din(0x30, 0x80, 0x80, 0x80, 0x80, 0x80))
    }
    // legal 4-byte varint still decodes (max 268435455 refused only at 5)
    val p = MqttCodec.readPacket(din(Seq(0xC0, 0x02, 0x01, 0x02): _*))
    assert(p.ptype == 12 && p.body.length == 2)
    // truncated PUBLISH topic raises IO (reconnectable), not IndexOOB
    intercept[java.io.IOException] {
      MqttCodec.decodePublish(Array[Byte](0x00, 0x10, 'a'))
    }
    // strings past the 2-byte length prefix refuse instead of emitting a
    // corrupt frame — as IOException so the send path routes through
    // reconnect instead of killing the worker thread (round-13 ADVICE)
    intercept[java.io.IOException] {
      MqttCodec.subscribeBody(1, "x" * 70000)
    }
  }

  test("MQTT readPacketOpt: idle timeout is None, mid-frame stall is IOException") {
    import graft.sources.MqttCodec
    import java.io.DataInputStream
    val server = new java.net.ServerSocket(0)
    val client = new java.net.Socket("127.0.0.1", server.getLocalPort)
    val peer = server.accept()
    try {
      client.setSoTimeout(300)
      val in = new DataInputStream(client.getInputStream)
      // nothing sent: timeout BEFORE the header byte = idleness
      assert(MqttCodec.readPacketOpt(in).isEmpty)
      // one header byte then silence: the stream is committed to a frame
      // — pre-fix this read as idleness and the next read parsed
      // mid-frame bytes as a new header (silent desync)
      peer.getOutputStream.write(0x30)
      peer.getOutputStream.flush()
      intercept[java.io.IOException] { MqttCodec.readPacketOpt(in) }
    } finally { client.close(); peer.close(); server.close() }
  }

  test("SpaceSaving mutable fold matches the immutable MG semantics") {
    // the round-13 rewrite switched the per-partition fold to a shared
    // mutable map; pin equality against a driver-side immutable MG over
    // a skewed stream (evictions exercised: capacity 4, 10 distinct)
    val words = (1 to 400).map { i =>
      val r = (i * 2654435761L) % 100
      if (r < 40) "a" else if (r < 65) "b" else if (r < 80) "c"
      else s"t${r % 10}"
    }
    def mgRef(ws: Seq[String], cap: Int): Map[String, Long] =
      ws.foldLeft(Map.empty[String, Long]) { (m, w) =>
        m.get(w) match {
          case Some(c) => m.updated(w, c + 1)
          case None if m.size < cap => m.updated(w, 1L)
          case None => m.flatMap { case (k, c) =>
            if (c > 1) Some(k -> (c - 1)) else None }
        }
      }
    // single partition so the fold order matches the driver reference
    val ds = spark.createDataset(words)(org.apache.spark.sql.Encoders.STRING)
      .repartition(1)
    val got = graft.operators.SpaceSaving.summarize(ds, capacity = 4)
    // same per-partition order is not guaranteed after repartition; MG
    // guarantees (not exact equality) are the portable contract:
    // est <= true <= est + N/(cap+1), heavy items present
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = words.size / 5
    got.foreach { case (w, est) =>
      val t = exact(w)
      assert(est <= t && t <= est + bound, s"MG bound broken for $w: est=$est true=$t")
    }
    exact.filter(_._2 > bound).keys.foreach { w =>
      assert(got.contains(w), s"heavy item $w missing (true=${exact(w)} > $bound)")
    }
    // and the driver reference satisfies the same bounds (sanity)
    mgRef(words, 4).foreach { case (w, est) => assert(est <= exact(w)) }
  }
}
