package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GpioScript, SpiScript}

/** S10 SPI/GPIO replay grammar goldens (the ExtSpiDevice / InterruptPins
  * analog of I2cSpec): parsed scripts, register combining, capture
  * decode, and the streaming replay sources end-to-end.
  */
class SpiGpioSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val spiXml =
    """<spiset script="adc">
      |  <command id="status" info="single byte register">
      |    <read reg="40|80" return="2"/>
      |  </command>
      |  <command id="sample" info="setup then word + triple reads">
      |    <write>A0 01</write>
      |    <read reg="10" return="3"/>
      |    <read reg="20" return="4"/>
      |  </command>
      |</spiset>""".stripMargin

  test("spi script parses the SPICommand grammar incl. reg modifiers") {
    val cmds = SpiScript.parseScript(spiXml)
    assert(cmds.keySet == Set("adc:status", "adc:sample"))
    assert(cmds("adc:status").steps ==
      Seq(SpiScript.Read(0xC0, 2))) // 0x40 | 0x80
    assert(cmds("adc:sample").steps == Seq(
      SpiScript.Write(Seq(0xA0, 0x01)),
      SpiScript.Read(0x10, 3),
      SpiScript.Read(0x20, 4)))
    assert(SpiScript.combineReg("40&C1") == 0x40)
    assert(SpiScript.combineReg("0x1A") == 0x1A)
  }

  test("spi capture decode matches the reference register combining") {
    val cmds = SpiScript.parseScript(spiXml)
    // readSingleByteRegister: 2-byte transfer, echo then the value
    assert(SpiScript.decodeReplay(cmds("adc:status"),
      Array(0xFF, 0x5A).map(_.toByte)) == Seq(0x5AL))
    // write consumes 2 bytes of capture, word read c[1]*256+c[2],
    // triple read c[1]*65536+c[2]*256+c[3] (ExtSpiDevice:66,100)
    val capture = Array(
      0x00, 0x00,       // clocked back during the write, discarded
      0xFF, 0x12, 0x34, // word transfer: echo, msb, lsb
      0xFF, 0x01, 0x02, 0x03 // triple: echo + 3 data bytes
    ).map(_.toByte)
    assert(SpiScript.decodeReplay(cmds("adc:sample"), capture) ==
      Seq(0x1234L, 0x010203L))
    // short capture: missing trailing transfer yields no value, no throw
    assert(SpiScript.decodeReplay(cmds("adc:sample"),
      Array(0x00, 0x00, 0xFF, 0x12, 0x34).map(_.toByte)) == Seq(0x1234L))
  }

  private val gpioXml =
    """<dcafs><gpio>
      |  <interrupt pin="17" edge="falling"><cmd>sd:trigger</cmd></interrupt>
      |  <interrupt pin="27" edge="both">
      |    <cmd>rv:update</cmd><cmd>log:pin27</cmd>
      |  </interrupt>
      |</gpio></dcafs>""".stripMargin

  test("gpio interrupt grammar parses and events fire the right cmds") {
    val specs = GpioScript.parseGpio(gpioXml)
    assert(specs == Seq(
      GpioScript.InterruptSpec(17, "falling", Seq("sd:trigger")),
      GpioScript.InterruptSpec(27, "both", Seq("rv:update", "log:pin27"))))
    assert(GpioScript.fired(specs, 17, "falling") == Seq("sd:trigger"))
    assert(GpioScript.fired(specs, 17, "rising").isEmpty) // edge mismatch
    assert(GpioScript.fired(specs, 27, "rising") == Seq("rv:update", "log:pin27"))
    assert(GpioScript.fired(specs, 27, "falling") == Seq("rv:update", "log:pin27"))
    assert(GpioScript.fired(specs, 5, "falling").isEmpty) // unknown pin
  }

  test("spiReplay and gpioReplay stream recorded captures end-to-end") {
    val spiDir = Files.createTempDirectory("graft-spi-replay")
    Files.write(spiDir.resolve("cap.txt"),
      "0000FF1234FF010203\n".getBytes(StandardCharsets.UTF_8))
    val q1 = LineSources.spiReplay(spark, spiDir.toString, spiXml, "adc:sample")
      .writeStream.format("memory").queryName("spi_replay_out")
      .outputMode("append").start()
    try {
      q1.processAllAvailable()
      val rows = spark.table("spi_replay_out").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[scala.collection.Seq[Long]]("values").toSeq ==
        Seq(0x1234L, 0x010203L))
    } finally q1.stop()

    val gpioDir = Files.createTempDirectory("graft-gpio-replay")
    Files.write(gpioDir.resolve("events.txt"),
      "17,falling\n27,rising\n17,rising\n".getBytes(StandardCharsets.UTF_8))
    runGpioReplayChecks(gpioDir)
  }

  private def runGpioReplayChecks(gpioDir: java.nio.file.Path): Unit = {
    val q2 = LineSources.gpioReplay(spark, gpioDir.toString, gpioXml)
      .writeStream.format("memory").queryName("gpio_replay_out")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      val rows = spark.table("gpio_replay_out").collect()
        .map(r => (r.getAs[Int]("pin"), r.getAs[String]("edge"),
          r.getAs[scala.collection.Seq[String]]("cmds").toSeq))
        .sortBy(r => (r._1, r._2))
      assert(rows.toSeq == Seq(
        (17, "falling", Seq("sd:trigger")),
        (17, "rising", Seq.empty),
        (27, "rising", Seq("rv:update", "log:pin27"))))
    } finally q2.stop()
  }

  test("gpioLevelReplay derives edges from raw level samples in keyed state") {
    val dir = Files.createTempDirectory("graft-gpio-level")
    // pin 17: 1 (baseline, no event) -> 0 (falling) -> 0 (no change) ->
    //         1 (rising — not a configured edge: event with empty cmds)
    // pin 27: 0 (baseline) -> 1 (rising, 'both' covers it)
    Files.write(dir.resolve("cap1.txt"),
      ("100,17,1\n110,27,0\n120,17,0\n130,17,0\n" +
        "140,27,1\n150,17,1\n").getBytes(StandardCharsets.UTF_8))
    val q = LineSources.gpioLevelReplay(spark, dir.toString, gpioXml)
      .writeStream.format("memory").queryName("gpio_level_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // second file in a LATER micro-batch: the last-level state must
      // carry across batches — pin 17 was left high, so 0 is a falling
      // edge, not a baseline reset
      Files.write(dir.resolve("cap2.txt"),
        "200,17,0\n".getBytes(StandardCharsets.UTF_8))
      q.processAllAvailable()
      val rows = spark.table("gpio_level_out").collect()
        .map(r => (r.getAs[Long]("ms"), r.getAs[Int]("pin"),
          r.getAs[String]("edge"),
          r.getAs[scala.collection.Seq[String]]("cmds").toSeq))
        .sortBy(_._1)
      assert(rows.toSeq == Seq(
        (120L, 17, "falling", Seq("sd:trigger")),
        (140L, 27, "rising", Seq("rv:update", "log:pin27")),
        (150L, 17, "rising", Seq.empty),
        (200L, 17, "falling", Seq("sd:trigger"))),
        s"got: ${rows.toSeq}")
    } finally q.stop()
  }
}
