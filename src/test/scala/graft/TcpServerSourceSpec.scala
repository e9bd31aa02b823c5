package graft

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** S11 inbound ingest: sensors connect *into* the engine
  * (`TcpServer.java:30` TransServer). Two concurrent clients, per-
  * connection `>>>id:` / `>>>label:` retuning acked in-band and applied
  * to subsequent rows only on that connection
  * (`TransHandler.java:118-180`).
  */
class TcpServerSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def freePort(): Int = {
    val s = new ServerSocket(0)
    try s.getLocalPort finally s.close()
  }

  private def connect(port: Int): Socket = {
    val deadline = System.currentTimeMillis() + 15000
    var last: Exception = null
    while (System.currentTimeMillis() < deadline) {
      try return new Socket("127.0.0.1", port)
      catch { case e: java.io.IOException => last = e; Thread.sleep(100) }
    }
    throw new AssertionError(s"server never came up on $port", last)
  }

  test("two concurrent inbound clients, labels applied per connection") {
    val port = freePort()
    val q = spark.readStream
      .format("graft.sources.TcpServerLineSource")
      .option("port", port.toString)
      .option("label", "trans")
      .load()
      .writeStream.format("memory").queryName("trans_out")
      .outputMode("append").start()
    try {
      val a = connect(port)
      val b = connect(port)
      val aOut = new PrintWriter(
        new java.io.OutputStreamWriter(a.getOutputStream, StandardCharsets.UTF_8), true)
      val aIn = new BufferedReader(
        new InputStreamReader(a.getInputStream, StandardCharsets.UTF_8))
      val bOut = new PrintWriter(
        new java.io.OutputStreamWriter(b.getOutputStream, StandardCharsets.UTF_8), true)

      // client A renames itself and its label; acks come back on A only
      aOut.println(">>>id:sensorA")
      assert(aIn.readLine() == "Altered id to sensorA")
      aOut.println(">>>label:gps")
      assert(aIn.readLine() == "Altered label to gps")
      aOut.println(">>>label?")
      assert(aIn.readLine() == "label is gps")

      aOut.println("A-fix-1")
      aOut.println("A-fix-2")
      bOut.println("B-depth-1")

      val deadline = System.currentTimeMillis() + 15000
      var rows = Array.empty[org.apache.spark.sql.Row]
      while (rows.length < 3 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        rows = spark.table("trans_out").collect()
        if (rows.length < 3) Thread.sleep(100)
      }
      assert(rows.length == 3, s"expected 3 data rows, got ${rows.toSeq}")

      val aRows = rows.filter(_.getAs[String]("line").startsWith("A-"))
      val bRows = rows.filter(_.getAs[String]("line").startsWith("B-"))
      assert(aRows.length == 2 && bRows.length == 1)
      // control verbs were consumed in-band, never emitted as data
      assert(!rows.exists(_.getAs[String]("line").startsWith(">>>")))
      assert(aRows.forall(_.getAs[String]("origin") == "sensorA"))
      assert(aRows.forall(_.getAs[String]("label") == "gps"))
      // B never retuned: default label, remote-address origin
      assert(bRows.forall(_.getAs[String]("label") == "trans"))
      assert(bRows.forall(_.getAs[String]("origin").contains("127.0.0.1")))

      a.close(); b.close()
    } finally q.stop()
  }

  test("kill-and-restart: committed rows never re-emit, new arrivals resume") {
    val port = freePort()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-trans-ckpt")
      .toFile.getAbsolutePath
    val received = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    def startQuery() = spark.readStream
      .format("graft.sources.TcpServerLineSource")
      .option("port", port.toString).option("label", "trans")
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => received.add(r.getAs[String]("line")))
      }
      .option("checkpointLocation", ckpt).start()
    def awaitCount(q: org.apache.spark.sql.streaming.StreamingQuery,
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
      val c = connect(port)
      val out = new PrintWriter(
        new java.io.OutputStreamWriter(c.getOutputStream, StandardCharsets.UTF_8), true)
      out.println("one"); out.println("two")
      assert(awaitCount(q1, 2).sorted == Seq("one", "two"))
      c.close()
    } finally q1.stop()

    // a new incarnation on the same checkpoint: committed offsets hold,
    // a fresh client's lines arrive exactly once, nothing replays
    received.clear()
    val q2 = startQuery()
    try {
      val c = connect(port)
      val out = new PrintWriter(
        new java.io.OutputStreamWriter(c.getOutputStream, StandardCharsets.UTF_8), true)
      out.println("three")
      val got = awaitCount(q2, 1)
      assert(got == Seq("three"),
        s"expected only the post-restart line, got $got")
      c.close()
    } finally q2.stop()
  }
}
