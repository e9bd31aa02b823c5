package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{BufferCollector, ConfirmCollector}

/** K10 confirm / K11 buffer collectors + S3/S4 modbus frame decode +
  * stream lifecycle hello — the control-plane rows of SURVEY §2.2/§2.8.
  */
class ControlPlaneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("confirm collector: match advances the queue, ** substitutes") {
    val sent = scala.collection.mutable.ArrayBuffer.empty[String]
    val cc = new ConfirmCollector(sent += _, maxAttempts = 3, timeoutSeconds = 60)
    val f1 = cc.addConfirm("INIT", "OK:**")
    val f2 = cc.addConfirm("START", "STARTED")
    assert(sent.toSeq == Seq("INIT")) // FIFO: START not sent yet
    cc.onReply("ignored")             // non-matching reply ignored
    cc.onReply("ok:INIT")             // case-insensitive + ** substitution
    assert(scala.concurrent.Await.result(f1, scala.concurrent.duration.Duration("5s")))
    assert(sent.toSeq == Seq("INIT", "START"))
    cc.onReply("STARTED")
    assert(scala.concurrent.Await.result(f2, scala.concurrent.duration.Duration("5s")))
    assert(cc.pending == 0)
  }

  test("confirm collector: retries then reports failure") {
    val sent = scala.collection.mutable.ArrayBuffer.empty[String]
    val cc = new ConfirmCollector(sent.synchronized { s => sent += s },
      maxAttempts = 2, timeoutSeconds = 1)
    val f = cc.addConfirm("PING", "PONG")
    val ok = scala.concurrent.Await.result(f, scala.concurrent.duration.Duration("10s"))
    assert(!ok, "should fail after retries with no reply")
    assert(sent.count(_ == "PING") == 2, s"sent: $sent")
  }

  test("confirm collector: empty reply is fire-and-forget") {
    val sent = scala.collection.mutable.ArrayBuffer.empty[String]
    val cc = new ConfirmCollector(sent += _)
    val f = cc.addConfirm("RESET", "")
    assert(scala.concurrent.Await.result(f, scala.concurrent.duration.Duration("5s")))
    assert(sent.toSeq == Seq("RESET"))
  }

  test("buffer collector: hands over when the buffer size is exceeded") {
    @volatile var result: (Seq[String], Boolean) = null
    val bc = new BufferCollector(bufferSize = 2,
      onFinished = (lines, ok) => result = (lines, ok))
    assert(bc.addData("a"))
    assert(bc.addData("b"))
    assert(!bc.addData("c")) // size exceeded -> finished, collector invalid
    assert(result == (Seq("a", "b", "c"), true))
    assert(!bc.addData("d")) // no further collection
    assert(bc.collected == Seq("a", "b", "c"))
  }

  test("buffer collector: timeout hands over a partial (or empty) buffer") {
    @volatile var result: (Seq[String], Boolean) = null
    val bc = new BufferCollector(timeoutMillis = 200,
      onFinished = (lines, ok) => result = (lines, ok))
    bc.addData("only")
    val deadline = System.currentTimeMillis() + 5000
    while (result == null && System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(result == (Seq("only"), true))
  }

  test("modbus_decode: golden RTU frames (CRC pinned vs independent impl)") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.modbus_decode
    import spark.implicits._
    val df = Seq(
      "010304000A000B9BF6",  // slave 1 read-holding resp: regs 0x000A, 0x000B
      "0206000101239870",    // slave 2 write-single echo: addr 1, value 0x0123
      "010304000A000B9BF7",  // corrupted CRC
      "FF00"                 // too short
    ).toDF("hex")
      .withColumn("mb", modbus_decode(unhex(col("hex"))))
      .select("mb.slave", "mb.func", "mb.registers", "mb.crc_ok")
    val rows = df.collect()
    assert(rows(0).getInt(0) == 1 && rows(0).getInt(1) == 3)
    assert(rows(0).getSeq[Int](2) == Seq(10, 11) && rows(0).getBoolean(3))
    assert(rows(1).getInt(0) == 2 && rows(1).getInt(1) == 6)
    assert(rows(1).getSeq[Int](2) == Seq(1, 0x123) && rows(1).getBoolean(3))
    assert(!rows(2).getBoolean(3), "corrupted CRC must not validate")
    assert(!rows(3).getBoolean(3))
  }

  test("S3/S4 modbus frame replay source decodes recorded captures") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mb").toFile.getAbsolutePath
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/cap1.txt"),
      "010304000A000B9BF6\n0206000101239870\n".getBytes)
    val q = LineSources.modbusReplay(spark, dir)
      .writeStream.format("memory").queryName("mb_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("mb_out").orderBy("slave").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Int]("slave") == 1 &&
        rows(0).getSeq[Int](rows(0).fieldIndex("registers")).toSeq == Seq(10, 11) &&
        rows(0).getAs[Boolean]("crc_ok"))
      assert(rows(1).getAs[Int]("slave") == 2)
    } finally q.stop()
  }

  test("S9 cmd source emits the command result per tick") {
    val df = LineSources.timedCmd(spark, () => "status:" + (40 + 2), rowsPerSecond = 50)
    val q = df.writeStream.format("memory").queryName("cmd_out")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      var n = 0L
      while (n == 0 && System.currentTimeMillis() < deadline) {
        Thread.sleep(200); n = spark.table("cmd_out").count()
      }
      assert(n > 0)
      assert(spark.table("cmd_out").select("line").distinct().collect()
        .map(_.getString(0)).toSeq == Seq("status:42"))
    } finally q.stop()
  }

  test("tcp source sends the hello string on connect (lifecycle open cmd)") {
    val server = new java.net.ServerSocket(0)
    @volatile var greeting: String = null
    val accept = new Thread(() => {
      try {
        val sock = server.accept()
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(sock.getInputStream))
        greeting = in.readLine()
      } catch { case _: java.io.IOException => }
    })
    accept.setDaemon(true); accept.start()
    val q = spark.readStream
      .format("graft.sources.TcpLineSource")
      .option("host", "127.0.0.1").option("port", server.getLocalPort.toString)
      .option("hello", "WAKEUP,1")
      .load()
      .writeStream.format("memory").queryName("hello_out").outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 10000
      while (greeting == null && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(greeting == "WAKEUP,1", s"got $greeting")
    } finally { q.stop(); server.close() }
  }
}
