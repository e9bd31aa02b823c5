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
}
