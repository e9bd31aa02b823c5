package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.VendorSerial

/** Golden decode specs for the vendor serial framing codecs
  * (SeasunStream / MultiStream quirk protocols), closing the serial
  * family symmetrically with I2cSpec: byte-exact frames, resync behavior,
  * chunk-boundary statefulness, and the Spark replay rendering.
  */
class VendorSerialSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("seasun: golden 3-byte frame decodes to the reference's addr;value") {
    // bytes 0x0B,0x07,0x1A: odd,odd,even -> rec=(10,6,13)
    // value = 10/2 + (6<<6) + ((13%4)<<14) = 5 + 384 + 16384 = 16773
    // addr  = 13/4 = 3
    val d = new VendorSerial.SeasunDecoder
    assert(d.feed(Array[Byte](0x0B, 0x07, 0x1A)) == Seq("3;16773"))
  }

  test("seasun: parity violations reset the scanner until a clean frame arrives") {
    val d = new VendorSerial.SeasunDecoder
    // 0x02 is even at slot 0 (bad), 0x0B odd starts a frame, 0x08 even at
    // slot 1 (bad, resets), then a full clean frame
    val noisy = Array[Byte](0x02, 0x0B, 0x08, 0x0B, 0x07, 0x1A)
    assert(d.feed(noisy) == Seq("3;16773"))
  }

  test("seasun: frames spanning feed() chunks decode once, at completion") {
    val d = new VendorSerial.SeasunDecoder
    assert(d.feed(Array[Byte](0x0B, 0x07)).isEmpty)
    assert(d.feed(Array[Byte](0x1A, 0x0B)) == Seq("3;16773"))
    assert(d.feed(Array[Byte](0x07, 0x1A)) == Seq("3;16773"))
  }

  test("multiplex: encode/decode round-trips and carries the device id") {
    val d = new VendorSerial.MultiplexDecoder
    val frame = VendorSerial.multiplexEncode('1', "hello world").get
    assert(d.feed(frame) == Seq(('1', "hello world")))
    // two devices back to back in one burst
    val burst = VendorSerial.multiplexEncode('2', "a=3").get ++
      VendorSerial.multiplexEncode('7', "b=4").get
    assert(d.feed(burst) == Seq(('2', "a=3"), ('7', "b=4")))
  }

  test("multiplex: header mismatch resyncs, re-considering '_' as a new start") {
    val d = new VendorSerial.MultiplexDecoder
    // positions 2,3 are wildcards, so the reset path needs a mismatch at
    // position 4: 'Z' != ')' kills the frame, the following clean frame
    // must still decode (its leading '_' restarts the scan)
    val bad = Array[Byte]('_', '(', '1', 2, 'Z')
    val good = VendorSerial.multiplexEncode('3', "ok").get
    assert(d.feed(bad ++ good) == Seq(('3', "ok")))
  }

  test("multiplex: oversized messages are refused at encode (1-byte length)") {
    assert(VendorSerial.multiplexEncode('1', "x" * 256).isEmpty)
    assert(VendorSerial.multiplexEncode('1', "x" * 255).nonEmpty)
  }

  test("seasun + multiplex captures replay through the Spark line plane") {
    def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
    val seaDir = java.nio.file.Files.createTempDirectory("graft-seasun-replay")
    val muxDir = java.nio.file.Files.createTempDirectory("graft-mux-replay")
    // one capture line per burst, like the i2c replay layout
    val seasunBurst = Array[Byte](0x0B, 0x07, 0x1A, 0x0B, 0x07, 0x1E)
    java.nio.file.Files.write(seaDir.resolve("seasun.txt"),
      (hex(seasunBurst) + "\n").getBytes)
    val muxBurst = VendorSerial.multiplexEncode('1', "t=5.0").get ++
      VendorSerial.multiplexEncode('2', "t=6.5").get
    java.nio.file.Files.write(muxDir.resolve("mux.txt"),
      (hex(muxBurst) + "\n").getBytes)

    val sea = LineSources.seasunReplay(spark, seaDir.toString)
    val seaQ = sea.writeStream.format("memory").queryName("vendor_sea")
      .outputMode("append").start()
    try {
      seaQ.processAllAvailable()
      val got = spark.table("vendor_sea").collect().map(_.getAs[String]("out")).sorted
      // second frame: rec2 = 0x1E/2 = 15 -> addr 15/4 = 3,
      // value = 5 + (6<<6) + ((15%4)<<14) = 5 + 384 + 49152 = 49541
      assert(got.toSeq == Seq("3;16773", "3;49541").sorted)
    } finally seaQ.stop()

    val mux = LineSources.multiplexReplay(spark, muxDir.toString)
    val muxQ = mux.writeStream.format("memory").queryName("vendor_mux")
      .outputMode("append").start()
    try {
      muxQ.processAllAvailable()
      val rows = spark.table("vendor_mux").collect()
        .filter(_.getAs[String]("out").startsWith("t="))
        .map(r => (r.getAs[String]("origin"), r.getAs[String]("out"))).sorted
      assert(rows.length == 2)
      assert(rows.forall { case (o, _) => o.endsWith(":1") || o.endsWith(":2") })
      assert(rows.map(_._2).toSeq.sorted == Seq("t=5.0", "t=6.5"))
    } finally muxQ.stop()
  }
}
