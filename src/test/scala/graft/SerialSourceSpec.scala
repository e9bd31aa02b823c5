package graft

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

/** S3 serial source over a REAL tty read path: a Python helper allocates a
  * PTY pair (the kernel's tty discipline, same read path as a UART-backed
  * /dev/ttyUSBx), writes CRLF-framed sentences into the master side, and
  * the engine streams the slave device — reference SerialStream semantics
  * (eol split, reopen on error) without hardware.
  */
class SerialSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("serial line source streams a tty device (PTY loopback, eol split)") {
    val helper = Files.createTempFile("graft-pty", ".py")
    Files.write(helper,
      """import os, pty, sys, time, tty
        |m, s = pty.openpty()
        |tty.setraw(s)
        |print(os.ttyname(s), flush=True)
        |time.sleep(1.5)  # let the reader open the slave first
        |for i in range(12):
        |    os.write(m, ("$GPZDA,%03d*hh" % i + "\r\n").encode())
        |    time.sleep(0.05)
        |time.sleep(60)  # keep the pty alive until the test kills us
        |""".stripMargin.getBytes)
    val proc = new ProcessBuilder("python3", helper.toString)
      .redirectErrorStream(true).start()
    val device = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream)).readLine()
    assert(device != null && device.startsWith("/dev/"), s"no pty: $device")
    val ckpt = Files.createTempDirectory("graft-serial-ck").toFile.getAbsolutePath
    val df = spark.readStream.format("graft.sources.SerialLineSource")
      .option("device", device).option("eol", "crlf").load()
    val q = df.writeStream.format("memory").queryName("serial_lines")
      .option("checkpointLocation", s"file:$ckpt").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var n = 0L
      while (n < 12 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        n = spark.table("serial_lines").count()
        if (n < 12) Thread.sleep(200)
      }
      val rows = spark.table("serial_lines").collect()
      val lines = rows.map(_.getAs[String]("line")).toSet
      assert(lines == (0 until 12).map(i => f"$$GPZDA,$i%03d*hh").toSet,
        s"got $lines")
      assert(rows.forall(_.getAs[String]("origin") == s"serial:$device"))
    } finally {
      q.stop()
      proc.destroyForcibly()
      proc.waitFor(5, TimeUnit.SECONDS)
    }
  }
}
