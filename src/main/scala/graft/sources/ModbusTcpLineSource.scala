package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.net.Socket
import java.util
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S4 (live half): Modbus-TCP client poller as a DataSourceV2 micro-batch
  * source — the Spark twin of the reference's MBAP client
  * (`/root/reference/src/io/stream/tcp/ModbusTCPStream.java` wiring
  * `ModbusTCP.java` as the frame handler). The reference connects to
  * `<address>` (port defaulting to 502, `ModbusTCPStream.java:38-42`),
  * writes requests as a fixed MBAP header + PDU (`ModbusTCP.java:122-129`:
  * header `{0,1,0,0,0,len+1,0}` then `fc, addr(2B), count(2B)`), and renders
  * each register-read response as a comma-joined line of `<prefix><n>:<val>`
  * pairs with prefix `reg` for fc 0x03 and `AI` for fc 0x04
  * (`ModbusTCP.java:19,61-73,84-91`), which then enters the ordinary line
  * plane under the stream's label.
  *
  * Two deliberate divergences from the reference's decode, both documented
  * bugs there rather than semantics to preserve:
  *  - register numbering starts at the POLLED address. The reference's
  *    handler doesn't know the request it answered, so it numbers from the
  *    response's byte-count field (`ModbusTCP.java:82` reads `data[8]`, the
  *    byte count, as the start register). This source owns the poll loop and
  *    knows the address.
  *  - values decode as standard signed 16-bit big-endian words. The
  *    reference sign-extends each byte separately and sums `hi*256 + lo`
  *    (`ModbusTCP.java:87-89`), which misdecodes any register whose low
  *    byte is ≥ 0x80 (e.g. 0x0186 = 390 renders as 134).
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.ModbusTcpLineSource")
  *     .option("host", "plc").option("port", "502")
  *     .option("fc", "3").option("address", "0").option("count", "4")
  *     .option("pollMillis", "1000").load()
  * }}}
  *
  * Schema: (line STRING, origin STRING, ts TIMESTAMP) — identical to the
  * other line sources so every downstream operator composes. Like them,
  * polled lines buffer on the driver, planned batches persist to the
  * checkpoint WAL (LineBufferWal) for exact restart replay, and the
  * single-partition batch shape is right for the edge-connector role (one
  * PLC is one slow stream; fleet-scale ingestion goes through Kafka).
  */
class ModbusTcpLineSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ModbusTcpLineSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // getTable receives the original-cased option map (Spark hands the
    // CaseInsensitiveStringMap's asCaseSensitiveMap), so a raw
    // properties.get("pollmillis") silently misses the documented
    // `.option("pollMillis", ...)` spelling. Re-wrap for the DSv2-standard
    // case-insensitive lookup.
    val opts = new CaseInsensitiveStringMap(properties)
    def p(key: String, dflt: String): String = opts.getOrDefault(key, dflt)
    new ModbusTcpTable(ModbusPoll(
      host = opts.get("host"),
      port = p("port", "502").toInt,
      unit = p("unit", "0").toInt,
      fc = p("fc", "3").toInt,
      address = p("address", "0").toInt,
      count = p("count", "2").toInt,
      pollMillis = p("pollmillis", "1000").toLong))
  }
}

object ModbusTcpLineSource {
  val schema: StructType = StructType(Seq(
    StructField("line", StringType),
    StructField("origin", StringType),
    StructField("ts", TimestampType)))

  /** Render a register-read response PDU the way the reference's handler
    * does (`ModbusTCP.java:84-91`), with the divergences documented on the
    * class: `reg`/`AI` prefix by function code, one `<prefix><n>:<value>`
    * pair per 16-bit word, comma-joined.
    */
  def renderRegisters(fc: Int, startAddress: Int, words: Array[Int]): String = {
    val prefix = if (fc == 4) "AI" else "reg"
    words.zipWithIndex
      .map { case (v, i) => s"$prefix${startAddress + i}:$v" }
      .mkString(",")
  }
}

private case class ModbusPoll(host: String, port: Int, unit: Int, fc: Int,
    address: Int, count: Int, pollMillis: Long)

private class ModbusTcpTable(poll: ModbusPoll) extends Table with SupportsRead {
  override def name(): String = s"modbustcp://${poll.host}:${poll.port}"
  override def schema(): StructType = ModbusTcpLineSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = ModbusTcpLineSource.schema
      override def toBatch: Batch = throw new UnsupportedOperationException(
        "graft-modbustcp is streaming-only")
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ModbusTcpMicroBatchStream(poll, checkpointLocation)
    }
}

private class ModbusTcpMicroBatchStream(poll: ModbusPoll,
    checkpointLocation: String) extends MicroBatchStream {

  private val wal = new LineBufferWal(checkpointLocation)
  private val buffer = ListBuffer.empty[(String, Long)]
  private var baseOffset = wal.maxPlannedOffset
  private val stopped = new AtomicBoolean(false)
  private val liveSocket =
    new java.util.concurrent.atomic.AtomicReference[Socket]()

  private val poller = new Thread(s"graft-modbustcp-${poll.host}:${poll.port}") {
    override def run(): Unit = {
      while (!stopped.get()) {
        try {
          val socket = new Socket(poll.host, poll.port)
          socket.setTcpNoDelay(true) // reference sets TCP_NODELAY (ModbusTCPStream.java:58)
          // half-open defense: a PLC that dies without FIN leaves
          // readResponse blocked forever (Thread.interrupt does NOT
          // unblock socket I/O) — a response slower than poll period
          // + 10 s means the connection is dead; reconnect
          socket.setSoTimeout(poll.pollMillis.toInt + 10000)
          liveSocket.set(socket)
          if (stopped.get()) { socket.close(); return }
          val out = new DataOutputStream(socket.getOutputStream)
          val in = new DataInputStream(socket.getInputStream)
          try {
            while (!stopped.get()) {
              out.write(ModbusFrames.request(poll.unit, poll.fc, poll.address, poll.count))
              out.flush()
              ModbusFrames.readResponse(in).foreach { case (fc, words) =>
                val line = ModbusTcpLineSource.renderRegisters(fc, poll.address, words)
                buffer.synchronized {
                  buffer += ((line, System.currentTimeMillis() * 1000L))
                }
              }
              Thread.sleep(poll.pollMillis)
            }
          } finally socket.close()
        } catch {
          case _: java.io.IOException => // auto-reconnect after a pause
          case _: InterruptedException =>
        }
        if (!stopped.get()) Thread.sleep(200)
      }
    }
  }
  poller.setDaemon(true)
  poller.start()

  override def initialOffset(): Offset = GraftLongOffset(wal.committedOffset)
  override def latestOffset(): Offset =
    buffer.synchronized(GraftLongOffset(baseOffset + buffer.size))
  override def deserializeOffset(json: String): Offset = GraftLongOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftLongOffset].value
    val e = end.asInstanceOf[GraftLongOffset].value
    val rows =
      if (s < baseOffset) wal.readRange(s, e) // restart replay
      else buffer.synchronized {
        val slice = buffer.slice((s - baseOffset).toInt, (e - baseOffset).toInt).toArray
        wal.persistBatch(s, e, slice)
        slice
      }
    Array(ModbusLinesPartition(rows, s"${poll.host}:${poll.port}"))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[ModbusLinesPartition]
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < p.rows.length }
        override def get(): InternalRow = InternalRow(
          UTF8String.fromString(p.rows(i)._1),
          UTF8String.fromString(p.origin),
          p.rows(i)._2)
        override def close(): Unit = {}
      }
    }

  override def commit(end: Offset): Unit = buffer.synchronized {
    val e = end.asInstanceOf[GraftLongOffset].value
    wal.commit(e)
    val drop = (e - baseOffset).toInt
    if (drop > 0) { buffer.remove(0, math.min(drop, buffer.size)); baseOffset = e }
  }

  override def stop(): Unit = {
    stopped.set(true)
    poller.interrupt() // unblocks the inter-poll sleep...
    // ...and closing the socket unblocks a blocked readResponse, which
    // interrupt alone cannot
    Option(liveSocket.getAndSet(null)).foreach { s =>
      try s.close() catch { case _: java.io.IOException => () }
    }
  }
}

private case class GraftLongOffset(value: Long) extends Offset {
  override def json(): String = value.toString
}

private case class ModbusLinesPartition(rows: Array[(String, Long)], origin: String)
  extends InputPartition

/** MBAP framing (public Modbus Application Protocol spec; the reference's
  * request shape is `ModbusTCP.java:114-129`). Shared by the live source and
  * the test mini-slave so golden frames are pinned in one place.
  */
object ModbusFrames {
  /** Request ADU: MBAP header (tid=1, proto=0, len=unit+pdu) + PDU
    * `fc, addrHi, addrLo, cntHi, cntLo`. The reference pins tid to 0x0001
    * (`ModbusTCP.java:18` `header={0,1,0,0,0,0,0}`); kept for parity — the
    * poll loop is strictly send-then-read, so correlation is positional.
    */
  def request(unit: Int, fc: Int, address: Int, count: Int): Array[Byte] =
    Array[Byte](0, 1, 0, 0, 0, 6, unit.toByte, fc.toByte,
      (address >> 8).toByte, address.toByte,
      (count >> 8).toByte, count.toByte)

  /** Read one MBAP-framed response: 7-byte header gives the remaining
    * length (`rec[4]*256+rec[5]` covers unit+PDU, `ModbusTCP.java:58`);
    * returns the function code and decoded 16-bit words for register-read
    * responses (fc 3/4), None for exception or other frames. Throws
    * EOFException on a half-closed peer so the caller reconnects.
    */
  def readResponse(in: DataInputStream): Option[(Int, Array[Int])] = {
    val header = new Array[Byte](7)
    in.readFully(header)
    val len = ((header(4) & 0xff) << 8) | (header(5) & 0xff)
    if (len < 2 || len > 260) throw new EOFException(s"bad MBAP length $len")
    val pdu = new Array[Byte](len - 1) // header already consumed the unit byte
    in.readFully(pdu)
    val fc = pdu(0) & 0xff
    if ((fc == 3 || fc == 4) && pdu.length >= 2) {
      val byteCount = pdu(1) & 0xff
      if (byteCount + 2 > pdu.length) None
      else Some((fc, Array.tabulate(byteCount / 2) { i =>
        // standard signed 16-bit big-endian word (see class doc for the
        // reference's per-byte sign-extension divergence)
        (((pdu(2 + 2 * i) & 0xff) << 8) | (pdu(3 + 2 * i) & 0xff)).toShort.toInt
      }))
    } else None
  }
}
