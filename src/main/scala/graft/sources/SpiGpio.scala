package graft.sources

import java.io.StringReader

import javax.xml.parsers.DocumentBuilderFactory
import org.w3c.dom.Element
import org.xml.sax.InputSource

/** S10 SPI command scripts, the replay half (reference
  * `/root/reference/src/io/hardware/spi/ExtSpiDevice.java:14-140`): parse
  * the SPICommand grammar — `<read reg=".." return="N"/>` full-duplex
  * transfers and `<write>hex</write>` — and decode a recorded
  * capture of clocked-back reply bytes into numeric register values with
  * the reference's combining rules: an N-byte transfer shifts the
  * register byte out first (the byte clocked back during it is bus noise
  * and is discarded), the remaining N-1 data bytes concatenate unsigned
  * msb-first (`readSingleByteRegister` N=2, `readWordRegister` N=3
  * `c[1]*256+c[2]`, `readTripleByteRegister` N=4). The `reg` attribute
  * supports the reference's `AA|BB` / `AA&BB` modifier combining (a
  * read-mod bit OR'd onto the register address). Live bus I/O (diozero)
  * stays hardware-gated like I2C/serial; recorded captures replay through
  * `LineSources.spiReplay`.
  */
object SpiScript {

  sealed trait Step
  /** One full-duplex transfer: send `reg` + NOPs, `count` bytes total. */
  final case class Read(reg: Int, count: Int) extends Step
  /** Write-only transfer: nothing clocked back is kept. */
  final case class Write(bytes: Seq[Int]) extends Step

  final case class SpiCommand(id: String, info: String, steps: Seq[Step])

  /** Parse one `<spiset script=..>` (or a root holding several) into
    * `script:id` keyed commands — the SPICommand.readCommand grammar.
    */
  def parseScript(xml: String): Map[String, SpiCommand] = {
    val doc = DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new InputSource(new StringReader(xml)))
    val root = doc.getDocumentElement
    val sets = if (root.getTagName == "spiset") Seq(root)
      else children(root).filter(_.getTagName == "spiset")
    sets.flatMap { set =>
      val script = attr(set, "script").getOrElse("")
      children(set).filter(_.getTagName == "command").map { c =>
        val cmd = SpiCommand(
          id = attr(c, "id").getOrElse(""),
          info = attr(c, "info").getOrElse(""),
          steps = children(c).map(parseStep))
        s"$script:${cmd.id}" -> cmd
      }
    }.toMap
  }

  private def parseStep(el: Element): Step = el.getTagName match {
    case "read" => Read(
      reg = attr(el, "reg").map(combineReg).getOrElse(0),
      count = attr(el, "return").map(_.toInt).getOrElse(0))
    case "write" => Write(hexBytes(el.getTextContent.trim))
    case other => throw new IllegalArgumentException(s"unknown spi step <$other>")
  }

  /** `AA|BB` ORs, `AA&BB` ANDs, plain hex passes through (reference
    * SPICommand.readCommand reg handling).
    */
  private[graft] def combineReg(s: String): Int = {
    val or = s.contains("|")
    val and = s.contains("&")
    val parts = s.split("[|&]").map(p => Integer.parseInt(p.trim.stripPrefix("0x"), 16))
    if (or) parts.reduce(_ | _)
    else if (and) parts.reduce(_ & _)
    else parts.head
  }

  private def hexBytes(s: String): Seq[Int] =
    s.split("[\\s,]+").filter(_.nonEmpty).toSeq.flatMap { tok =>
      val h0 = tok.stripPrefix("0x")
      val h = if (h0.length % 2 == 1) "0" + h0 else h0
      h.sliding(2, 2).map(Integer.parseInt(_, 16))
    }

  /** Decode one recorded capture (every byte the device clocked back, in
    * transfer order) into the command's register values: each read
    * consumes its transfer's bytes, drops the echo byte, combines the
    * data bytes unsigned msb-first; writes consume their length and keep
    * nothing.
    */
  def decodeReplay(cmd: SpiCommand, reply: Array[Byte]): Seq[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var pos = 0
    cmd.steps.foreach {
      case Read(_, count) =>
        val end = math.min(pos + count, reply.length)
        val data = reply.slice(pos + 1, end) // [pos] = echo during reg byte
        pos = end
        if (data.nonEmpty)
          out += data.foldLeft(0L)((acc, b) => acc * 256 + (b & 0xff))
      case Write(bytes) =>
        pos = math.min(pos + bytes.length, reply.length)
    }
    out.toSeq
  }

  private def attr(el: Element, name: String): Option[String] = {
    val v = el.getAttribute(name)
    if (v == null || v.isEmpty) None else Some(v)
  }

  private def children(el: Element): Seq[Element] = {
    val nodes = el.getChildNodes
    (0 until nodes.getLength).map(nodes.item).collect { case e: Element => e }
  }
}

/** S10 GPIO interrupts, the replay half (reference
  * `/root/reference/src/io/hardware/gpio/InterruptPins.java:15-82`):
  * parse the `<gpio><interrupt pin=.. edge=..><cmd>..</cmd></interrupt>`
  * settings grammar and map a recorded pin-event capture (lines of
  * `pin,edge`) to the commands each event fires — the reference wires
  * diozero `DigitalInputEvent`s to `Datagram.system(cmd)` dispatches;
  * live pin access stays hardware-gated.
  */
object GpioScript {

  final case class InterruptSpec(pin: Int, edge: String, cmds: Seq[String])

  /** Parse a `<gpio>` node (or a root containing one). Edges: falling
    * (default), rising, both (InterruptPins.readFromXml).
    */
  def parseGpio(xml: String): Seq[InterruptSpec] = {
    val doc = DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new InputSource(new StringReader(xml)))
    val root = doc.getDocumentElement
    val gpio = if (root.getTagName == "gpio") Seq(root)
      else children(root).filter(_.getTagName == "gpio")
    gpio.flatMap(g => children(g).filter(_.getTagName == "interrupt").map { isr =>
      InterruptSpec(
        pin = attr(isr, "pin").map(_.toInt).getOrElse(-1),
        edge = attr(isr, "edge").getOrElse("falling").toLowerCase,
        cmds = children(isr).filter(_.getTagName == "cmd").map(_.getTextContent.trim))
    })
  }

  /** Commands fired by one recorded event: pin must match and the
    * configured edge must cover the event's edge (`both` covers either) —
    * InterruptPins.accept's filter + dispatch.
    */
  def fired(specs: Seq[InterruptSpec], pin: Int, edge: String): Seq[String] =
    specs.filter(s => s.pin == pin &&
        (s.edge == "both" || s.edge == edge.toLowerCase))
      .flatMap(_.cmds)

  private def attr(el: Element, name: String): Option[String] = {
    val v = el.getAttribute(name)
    if (v == null || v.isEmpty) None else Some(v)
  }

  private def children(el: Element): Seq[Element] = {
    val nodes = el.getChildNodes
    (0 until nodes.getLength).map(nodes.item).collect { case e: Element => e }
  }
}
