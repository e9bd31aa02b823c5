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
}
