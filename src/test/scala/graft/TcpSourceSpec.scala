package graft

import java.io.PrintWriter
import java.net.ServerSocket

import org.scalatest.funsuite.AnyFunSuite

class TcpSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("tcp micro-batch source streams lines through a compiled path") {
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    @volatile var out: PrintWriter = null
    val accept = new Thread(() => {
      val sock = server.accept()
      out = new PrintWriter(sock.getOutputStream, true)
    })
    accept.setDaemon(true)
    accept.start()

    val df = spark.readStream
      .format("graft.sources.TcpLineSource")
      .option("host", "127.0.0.1").option("port", port.toString)
      .load()
    val q = PathCompiler.compile(
      PathSpec("tcp", ",", Seq(
        FilterStep(Seq("i0 above 0")),
        StoreStep(Seq(("v", 0, "double", "-1.0"), ("tag", 1, "string", "'x'"))))),
      df)
      .writeStream.format("memory").queryName("tcp_out").outputMode("append").start()
    try {
      // wait for the source's reader thread to connect
      val deadline = System.currentTimeMillis() + 10000
      while (out == null && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(out != null, "source never connected")
      out.println("4.5,alpha")
      out.println("-1.0,beta")  // filtered out
      out.println("7.25,gamma")
      // lines land on the driver buffer asynchronously; poll until seen
      var rows = Array.empty[org.apache.spark.sql.Row]
      while (rows.length < 2 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        rows = spark.table("tcp_out").collect()
        if (rows.length < 2) Thread.sleep(100)
      }
      assert(rows.map(_.getAs[Double]("v")).sorted.toSeq == Seq(4.5, 7.25))
      assert(rows.map(_.getAs[String]("tag")).sorted.toSeq == Seq("alpha", "gamma"))
    } finally {
      q.stop()
      server.close()
    }
  }

  test("kill-and-restart resumes from checkpoint without losing or duplicating lines") {
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    @volatile var out: PrintWriter = null
    val accept = new Thread(() => {
      while (!server.isClosed) {
        try {
          val sock = server.accept() // re-accept: the source reconnects
          out = new PrintWriter(sock.getOutputStream, true)
        } catch { case _: java.io.IOException => }
      }
    })
    accept.setDaemon(true)
    accept.start()

    val ckpt = java.nio.file.Files.createTempDirectory("graft-tcp-ckpt")
      .toFile.getAbsolutePath
    // memory sink can't recover from a checkpoint; foreachBatch can
    val received = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    def startQuery() = spark.readStream
      .format("graft.sources.TcpLineSource")
      .option("host", "127.0.0.1").option("port", port.toString)
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => received.add(r.getAs[String]("line")))
      }
      .option("checkpointLocation", ckpt).start()

    def awaitLines(q: org.apache.spark.sql.streaming.StreamingQuery,
        want: Int): Seq[String] = {
      val deadline = System.currentTimeMillis() + 15000
      while (received.size < want && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        if (received.size < want) Thread.sleep(100)
      }
      received.toArray(Array.empty[String]).toSeq
    }

    val q1 = startQuery()
    try {
      val deadline = System.currentTimeMillis() + 10000
      while (out == null && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(out != null, "source never connected")
      out.println("one"); out.println("two")
      assert(awaitLines(q1, 2).sorted == Seq("one", "two"))
    } finally q1.stop()

    // restart from the same checkpoint: committed offset restored, new
    // lines numbered after it — no replayed duplicates, no skipped range
    out = null
    received.clear()
    val q2 = startQuery()
    try {
      val deadline = System.currentTimeMillis() + 10000
      while (out == null && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(out != null, "source never reconnected")
      out.println("three")
      val got = awaitLines(q2, 1)
      assert(got == Seq("three"), s"expected only the new line, got $got")
      // the source receives <ckpt>/sources/<i> as its location — find the WAL
      val committedFile = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        try s.filter(p => p.getFileName.toString == "committed" &&
            p.getParent.getFileName.toString == "graft-wal")
          .findFirst().orElseThrow(() => new AssertionError("no WAL committed file"))
        finally s.close()
      }
      val walDir = committedFile.getParent
      val committed = new String(
        java.nio.file.Files.readAllBytes(committedFile)).trim.toLong
      // source commits lag one batch; everything past `committed` must be
      // covered by a persisted WAL segment so a second restart can replay it
      val walEnds = java.nio.file.Files.list(walDir).iterator()
      val maxWalEnd = {
        var m = committed
        while (walEnds.hasNext) {
          val n = walEnds.next().getFileName.toString
          if (n.endsWith(".wal")) m = math.max(m, n.stripSuffix(".wal").split("-")(1).toLong)
        }
        m
      }
      assert(committed >= 2, s"committed offset $committed should cover the first run")
      assert(maxWalEnd >= 3, s"WAL (up to $maxWalEnd) should cover the in-flight line")
    } finally {
      q2.stop()
      server.close()
    }
  }
}
