package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.I2cScript
import graft.sources.I2cScript._

/** S10 I2C command scripts vs the reference grammar and bit-packing
  * (`/root/reference/src/io/hardware/i2c/I2CCommand.java`,
  * `I2CWorker.convertBytesToInt`): commandset parse, capture decode with
  * math/discard/repeat, output rendering, and the streaming replay
  * source.
  */
class I2cSpec extends AnyFunSuite {

  // a TMP102-ish script: point at the temperature register, read one
  // 12-bit sample, scale to degrees; plus a config write with an alter
  private val script =
    """<commandset script="tmp102" output="dec">
      |  <command id="temp" info="read temperature" bits="12" scale="4">
      |    <write reg="01">60A0</write>
      |    <alter reg="01" operand="or">40</alter>
      |    <read reg="00" return="2" signed="yes"/>
      |    <math>i0=i0*0.0625</math>
      |  </command>
      |  <command id="burst" bits="16">
      |    <repeat cnt="3">
      |      <read reg="00" return="2"/>
      |    </repeat>
      |    <discard>2</discard>
      |  </command>
      |  <command id="serial" bits="8" output="char">
      |    <read reg="10" return="4"/>
      |  </command>
      |</commandset>""".stripMargin

  test("parseScript reads the reference commandset grammar") {
    val cmds = I2cScript.parseScript(script)
    assert(cmds.keySet == Set("tmp102:temp", "tmp102:burst", "tmp102:serial"))
    val temp = cmds("tmp102:temp")
    assert(temp.bits == 12 && temp.scale == 4 && temp.info == "read temperature")
    assert(temp.steps == Seq(
      Write(Seq(0x01, 0x60, 0xA0)),
      Alter(0x01, 0x40, "or"),
      Read(Seq(0x00), 2, 12, msbFirst = true, signed = true),
      MathStep(0, "i0*0.0625")))
    assert(cmds("tmp102:burst").steps == Seq(
      Repeat(3, Seq(Read(Seq(0x00), 2, 16, msbFirst = true, signed = false))),
      Discard(2)))
  }

  test("convertBytes matches the reference bit-packing rules") {
    // 8-bit: plain unsigned, two's complement when signed
    assert(I2cScript.convertBytes(Seq(0xFF, 0x7F), 8, msbFirst = true, signed = false)
      == Seq(255.0, 127.0))
    assert(I2cScript.convertBytes(Seq(0xFF, 0x7F), 8, msbFirst = true, signed = true)
      == Seq(-1.0, 127.0))
    // 12-bit: full first byte + high nibble of the second (0x4B0 = 1200)
    assert(I2cScript.convertBytes(Seq(0x4B, 0x00), 12, msbFirst = true, signed = false)
      == Seq(1200.0))
    // 12-bit signed: 0xE70 -> -400 (TMP102 negative temperature)
    assert(I2cScript.convertBytes(Seq(0xE7, 0x00), 12, msbFirst = true, signed = true)
      == Seq(-400.0))
    // 10-bit: full first byte + 2 MSB of the second
    assert(I2cScript.convertBytes(Seq(0xFF, 0xC0), 10, msbFirst = true, signed = false)
      == Seq(1023.0))
    // 16-bit both orders
    assert(I2cScript.convertBytes(Seq(0x12, 0x34), 16, msbFirst = true, signed = false)
      == Seq(0x1234.toDouble))
    assert(I2cScript.convertBytes(Seq(0x12, 0x34), 16, msbFirst = false, signed = false)
      == Seq(0x3412.toDouble))
    // 20-bit: two bytes + high nibble of the third
    assert(I2cScript.convertBytes(Seq(0x12, 0x34, 0x50), 20, msbFirst = true, signed = false)
      == Seq(0x12345.toDouble))
    // 24-bit and 32-bit concatenation
    assert(I2cScript.convertBytes(Seq(0x12, 0x34, 0x56), 24, msbFirst = true, signed = false)
      == Seq(0x123456.toDouble))
    assert(I2cScript.convertBytes(Seq(0x80, 0x00, 0x00, 0x00), 32, msbFirst = true,
      signed = true) == Seq(Int.MinValue.toDouble))
  }

  test("decodeReplay walks a capture through math, repeat and discard") {
    val cmds = I2cScript.parseScript(script)
    // temp: 0x4B0 = 1200 ticks * 0.0625 = 75.0 degrees
    assert(I2cScript.decodeReplay(cmds("tmp102:temp"), Array(0x4B, 0x00).map(_.toByte))
      == Seq(75.0))
    // burst: three 16-bit reads, discard keeps the first two
    val burst = Array(0x00, 0x01, 0x00, 0x02, 0x00, 0x03).map(_.toByte)
    assert(I2cScript.decodeReplay(cmds("tmp102:burst"), burst) == Seq(1.0, 2.0))
    // short capture: reads stop at the buffer end instead of failing
    assert(I2cScript.decodeReplay(cmds("tmp102:burst"), burst.take(4)) == Seq(1.0, 2.0))
  }

  test("format renders dec/hex/bin/char like the reference outType switch") {
    val cmd = I2cScript.parseScript(script)("tmp102:serial")
    assert(I2cScript.format(cmd, Seq(71, 82, 52, 50).map(_.toDouble)) == Seq("GR42"))
    assert(I2cScript.format(cmd.copy(outType = "hex"), Seq(10.0, 255.0))
      == Seq("0x0A", "0xFF"))
    assert(I2cScript.format(cmd.copy(outType = "bin"), Seq(5.0)) == Seq("0b101"))
    assert(I2cScript.format(cmd.copy(outType = "dec"), Seq(75.0, 75.5))
      == Seq("75", "75.5"))
  }

  test("i2cReplay streams a recorded capture through the script decode") {
    val spark = SparkTestSession.spark
    val dir = java.nio.file.Files.createTempDirectory("i2c-replay")
    java.nio.file.Files.write(dir.resolve("cap0.txt"),
      "4B00\nE700\n".getBytes) // 75.0 C and -25.0 C
    val df = LineSources.i2cReplay(spark, dir.toString, script, "tmp102:temp")
    val q = df.writeStream.format("memory").queryName("i2c_replay").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT out FROM i2c_replay ORDER BY out").collect()
        .map(_.getString(0))
      assert(rows.toSeq == Seq("-25", "75"))
    } finally q.stop()
  }
}
