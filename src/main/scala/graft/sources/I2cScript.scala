package graft.sources

import java.io.StringReader

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element
import org.xml.sax.InputSource

import graft.alerts.MatrixMath

/** S10 I2C command scripts, the replay half (reference
  * `/root/reference/src/io/hardware/i2c/I2CCommand.java:20-324`,
  * `I2CWorker.java:203-723`): parse the `<commandset>` XML grammar
  * (read/write/alter/wait/wait_ack/math/discard/repeat steps), decode a
  * recorded reply-byte capture into numeric values with the reference's
  * bit-packing rules (8/10/12/16/20/24/32 bits, msb/lsb order, signed),
  * apply the `iN=` math steps and the dec/hex/bin/char output rendering.
  * Live bus I/O (diozero) is hardware-gated like the live serial port —
  * recorded captures replay through `LineSources.i2cReplay`.
  *
  * Known divergences from the reference, deliberate: the 10-bit signed
  * case uses a true 10-bit two's complement (the reference reuses its
  * 12-bit fold) and the 32-bit case advances four bytes per value (the
  * reference strides three and scales by 65535 — an evident defect, not
  * a semantic).
  */
object I2cScript {

  sealed trait Step
  final case class Read(write: Seq[Int], count: Int, bits: Int,
      msbFirst: Boolean, signed: Boolean) extends Step
  final case class Write(bytes: Seq[Int]) extends Step
  final case class Alter(reg: Int, value: Int, op: String) extends Step
  final case class WaitMs(ms: Long) extends Step
  final case class WaitAck(attempts: Int) extends Step
  final case class MathStep(index: Int, expr: String) extends Step
  final case class Discard(from: Int) extends Step
  final case class Repeat(cnt: Int, body: Seq[Step]) extends Step

  final case class I2cCommand(
      id: String,
      info: String,
      bits: Int,
      msbFirst: Boolean,
      outType: String,
      scale: Int,
      steps: Seq[Step])

  /** Parse one command-script XML (`<commandset script=.. output=..>`
    * with `<command id=..>` children) into `script:id` keyed commands —
    * the reference `reloadSets` grammar.
    */
  def parseScript(xml: String): Map[String, I2cCommand] = {
    val doc = DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new InputSource(new StringReader(xml)))
    val root = doc.getDocumentElement
    val sets = if (root.getTagName == "commandset") Seq(root)
      else children(root).filter(_.getTagName == "commandset")
    sets.flatMap { set =>
      val script = attr(set, "script").getOrElse("")
      val defOut = attr(set, "output").getOrElse("dec")
      children(set).filter(_.getTagName == "command").map { c =>
        val bits = attr(c, "bits").map(_.toInt).getOrElse(8)
        val msb = attr(c, "msbfirst").forall(boolOf)
        val cmd = I2cCommand(
          id = attr(c, "id").getOrElse(""),
          info = attr(c, "info").getOrElse(""),
          bits = bits,
          msbFirst = msb,
          outType = attr(c, "output").getOrElse(defOut).toLowerCase,
          scale = attr(c, "scale").map(_.toInt).getOrElse(-1),
          steps = children(c).map(parseStep(_, bits, msb)))
        s"$script:${cmd.id}" -> cmd
      }
    }.toMap
  }

  private def parseStep(el: Element, defBits: Int, defMsb: Boolean): Step = {
    // contiguous hex splits pairwise like the reference fromHexStringToBytes
    def hexBytes(s: String): Seq[Int] =
      s.trim.split("[\\s,]+").filter(_.nonEmpty).toSeq.flatMap { tok =>
        val h0 = tok.stripPrefix("0x")
        val h = if (h0.length % 2 == 1) "0" + h0 else h0
        h.sliding(2, 2).map(Integer.parseInt(_, 16))
      }
    val reg = attr(el, "reg").map(hexBytes).getOrElse(Seq.empty)
    val text = el.getTextContent.trim
    el.getTagName match {
      case "read" =>
        // return="ix" refers to a previously read value (stored negative
        // in the reference); keep that encoding
        val ret = attr(el, "return").getOrElse("0").replace("i", "-").toInt
        Read(reg, ret,
          bits = attr(el, "bits").map(_.toInt).getOrElse(defBits),
          msbFirst = attr(el, "msbfirst").map(boolOf).getOrElse(defMsb),
          signed = attr(el, "signed").exists(boolOf))
      case "write" => Write(reg ++ (if (text.isEmpty) Seq.empty else hexBytes(text)))
      case "alter" =>
        val d = reg ++ (if (text.isEmpty) Seq.empty else hexBytes(text))
        Alter(d.head, d.lift(1).getOrElse(0), attr(el, "operand").getOrElse("or"))
      case "wait" => WaitMs(graft.DcafsXml.parsePeriodMillis(text))
      case "wait_ack" => WaitAck(text.toInt)
      case "math" =>
        val Array(target, expr) = text.split("=", 2)
        MathStep(target.trim.stripPrefix("i").toInt, expr.trim)
      case "discard" => Discard(text.toInt)
      case "repeat" =>
        Repeat(attr(el, "cnt").map(_.toInt).getOrElse(1),
          children(el).map(parseStep(_, defBits, defMsb)))
      case other => throw new IllegalArgumentException(s"unknown i2c step <$other>")
    }
  }

  /** The reference byte-combining rules (`I2CWorker.convertBytesToInt`):
    * 10/12/20 bits pack whole leading bytes plus the high bits of the
    * last; 16/24/32 concatenate in msb or lsb order; `signed` applies
    * two's complement at the target width.
    */
  def convertBytes(bytes: Seq[Int], bits: Int, msbFirst: Boolean,
      signed: Boolean): Seq[Double] = {
    def sign(v: Long, width: Int): Long =
      if (signed && v >= (1L << (width - 1))) v - (1L << width) else v
    val u = bytes.map(b => b & 0xff)
    bits match {
      case 8 => u.map(b => sign(b.toLong, 8).toDouble)
      case 10 => u.grouped(2).map(p => sign(p(0) * 4L + p(1) / 64, 10).toDouble).toSeq
      case 12 => u.grouped(2).map(p => sign(p(0) * 16L + p(1) / 16, 12).toDouble).toSeq
      case 16 => u.grouped(2).map { p =>
          val t = if (msbFirst) p(0) * 256L + p(1) else p(1) * 256L + p(0)
          sign(t, 16).toDouble
        }.toSeq
      case 20 => u.grouped(3).map { p =>
          val t = if (msbFirst) (p(0) * 256L + p(1)) * 16 + p(2) / 16
            else (p(2) * 256L + p(1)) * 16 + p(0) / 16
          sign(t, 20).toDouble
        }.toSeq
      case 24 => u.grouped(3).map { p =>
          val t = if (msbFirst) (p(0) * 256L + p(1)) * 256 + p(2)
            else (p(2) * 256L + p(1)) * 256 + p(0)
          sign(t, 24).toDouble
        }.toSeq
      case 32 => u.grouped(4).map { p =>
          val o = if (msbFirst) p else p.reverse
          val t = ((o(0) * 256L + o(1)) * 256 + o(2)) * 256 + o(3)
          sign(t, 32).toDouble
        }.toSeq
      case other => throw new IllegalArgumentException(s"unsupported bits $other")
    }
  }

  /** Decode one recorded reply capture (all bytes a device returned for
    * one command execution, in order) into the command's numeric results:
    * the replay rendering of `I2CWorker.doCommand` — reads consume
    * capture bytes, math/discard/repeat transform the result list,
    * wait/alter/write consume nothing.
    */
  def decodeReplay(cmd: I2cCommand, reply: Array[Byte]): Seq[Double] = {
    val results = scala.collection.mutable.ArrayBuffer.empty[Double]
    var pos = 0
    def take(n: Int): Seq[Int] = {
      val end = math.min(pos + n, reply.length)
      val slice = reply.slice(pos, end).map(_ & 0xff).toSeq
      pos = end
      slice
    }
    def run(steps: Seq[Step]): Unit = steps.foreach {
      case r: Read =>
        // negative count = take the byte count from an earlier result
        val n = if (r.count >= 0) r.count
          else results.lift(-r.count).map(_.toInt).getOrElse(0)
        if (n > 0) results ++= convertBytes(take(n), r.bits, r.msbFirst, r.signed)
      case WaitAck(_) =>
        // the capture records the attempt count the device needed
        take(1).foreach(b => results += b.toDouble)
      case MathStep(index, expr) =>
        val refs = results.zipWithIndex.map { case (v, i) => s"i$i" -> v }.toMap
        MatrixMath.solve(expr, refs).foreach { v =>
          val rounded = if (cmd.scale != -1)
            BigDecimal(v).setScale(cmd.scale, BigDecimal.RoundingMode.HALF_UP).toDouble
          else v
          if (index < results.size) results(index) = rounded else results += rounded
        }
      case Discard(from) => results.remove(from, math.max(0, results.size - from))
      case Repeat(cnt, body) => (0 until cnt).foreach(_ => run(body))
      case _: Write | _: Alter | _: WaitMs => ()
    }
    run(cmd.steps)
    results.toSeq
  }

  /** Output rendering (`I2CWorker` outType switch): dec drops the `.0`,
    * hex/bin prefix 0x/0b, char joins code points into one string.
    */
  def format(cmd: I2cCommand, values: Seq[Double]): Seq[String] = cmd.outType match {
    case "hex" => values.map { v =>
      val s = java.lang.Long.toHexString(v.toLong).toUpperCase
      "0x" + (if (s.length == 1) "0" else "") + s
    }
    case "bin" => values.map(v => "0b" + java.lang.Long.toBinaryString(v.toLong))
    case "char" => Seq(values.map(v => v.toInt.toChar).mkString)
    case _ => values.map(v => if (v == math.rint(v)) v.toLong.toString else v.toString)
  }

  private def boolOf(s: String): Boolean = Set("yes", "true", "1")(s.trim.toLowerCase)

  private def attr(el: Element, name: String): Option[String] = {
    val v = el.getAttribute(name)
    if (v == null || v.isEmpty) None else Some(v)
  }

  private def children(el: Element): Seq[Element] = {
    val nodes = el.getChildNodes
    (0 until nodes.getLength).map(nodes.item).collect { case e: Element => e }
  }
}
