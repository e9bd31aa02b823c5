package graft.sources

import java.io.FileInputStream
import java.nio.charset.StandardCharsets
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

/** S3: serial / tty line stream as a DataSourceV2 micro-batch source — the
  * Spark twin of the reference's SerialStream (port read, per-stream EOL
  * split, reopen on error,
  * `/root/reference/src/io/stream/serialport/SerialStream.java:1-416`,
  * `src/io/stream/StreamManager.java:448-456`).
  *
  * Pure JVM: the device is opened as a character-device file; port
  * parameters (baud, raw mode) are applied best-effort through `stty`
  * when a `baud` option is given — the jSerialComm-style native config is
  * the only part a JVM-only build can't do directly. A PTY pair exercises
  * the identical read path in tests (SerialSourceSpec), so everything but
  * the UART itself is verified in-sandbox.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.SerialLineSource")
  *     .option("device", "/dev/ttyUSB0").option("baud", "9600")
  *     .option("eol", "crlf").load()
  * }}}
  *
  * Schema: (line STRING, origin STRING, ts TIMESTAMP) — same shape as the
  * TCP/UDP/MQTT edge connectors, with the same checkpoint-WAL recovery.
  */
class SerialLineSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TcpLineSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val device = properties.get("device")
    require(device != null && device.nonEmpty, "serial source needs a device")
    new SerialLineTable(device,
      Option(properties.get("baud")).map(_.toInt),
      Option(properties.get("eol")).getOrElse("crlf"))
  }
}

private class SerialLineTable(device: String, baud: Option[Int], eol: String)
    extends Table with SupportsRead {
  override def name(): String = s"serial:$device"
  override def schema(): StructType = TcpLineSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = TcpLineSource.schema
      override def toBatch: Batch = throw new UnsupportedOperationException(
        "graft-serial is streaming-only")
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new SerialLineMicroBatchStream(device, baud, eol, checkpointLocation)
    }
}

private class SerialLineMicroBatchStream(device: String, baud: Option[Int],
    eol: String, checkpointLocation: String) extends MicroBatchStream {

  private val wal = new LineBufferWal(checkpointLocation)
  private val buffer = ListBuffer.empty[(String, Long)]
  private var baseOffset = wal.maxPlannedOffset
  private val stopped = new AtomicBoolean(false)
  private val liveStream =
    new java.util.concurrent.atomic.AtomicReference[FileInputStream]()

  private val eolBytes: Array[Byte] = (eol.toLowerCase match {
    case "crlf" => "\r\n"
    case "lf" => "\n"
    case "cr" => "\r"
    case custom => custom
  }).getBytes(StandardCharsets.UTF_8)

  /** Best-effort tty config (the SerialStream baud/databits setup): raw
    * mode + speed via stty; silently skipped off-POSIX or on a PTY that
    * rejects speeds.
    */
  private def configure(): Unit = baud.foreach { b =>
    try {
      new ProcessBuilder("stty", "-F", device, b.toString, "raw", "-echo")
        .redirectErrorStream(true).start().waitFor()
    } catch { case _: Exception => }
  }

  private val reader = new Thread(s"graft-serial-$device") {
    override def run(): Unit = {
      val acc = new scala.collection.mutable.ArrayBuffer[Byte]()
      def emitOnEol(): Unit =
        if (acc.length >= eolBytes.length &&
            acc.view.takeRight(eolBytes.length).sameElements(eolBytes)) {
          val line = new String(acc.dropRight(eolBytes.length).toArray,
            StandardCharsets.UTF_8)
          buffer.synchronized {
            buffer += ((line, System.currentTimeMillis() * 1000L))
          }
          acc.clear()
        }
      while (!stopped.get()) {
        try {
          configure()
          val in = new FileInputStream(device)
          liveStream.set(in)
          try {
            if (stopped.get()) return
            var b = in.read()
            while (b >= 0 && !stopped.get()) {
              acc += b.toByte
              emitOnEol()
              b = in.read()
            }
          } finally in.close()
        } catch {
          case _: java.io.IOException => // device gone — reopen after a pause
        }
        if (!stopped.get()) Thread.sleep(200)
      }
    }
  }
  reader.setDaemon(true)
  reader.start()

  override def initialOffset(): Offset = SerialOffset(wal.committedOffset)
  override def latestOffset(): Offset =
    buffer.synchronized(SerialOffset(baseOffset + buffer.size))
  override def deserializeOffset(json: String): Offset = SerialOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SerialOffset].value
    val e = end.asInstanceOf[SerialOffset].value
    val rows =
      if (s < baseOffset) wal.readRange(s, e) // restart replay
      else buffer.synchronized {
        val slice = buffer.slice((s - baseOffset).toInt, (e - baseOffset).toInt).toArray
        wal.persistBatch(s, e, slice)
        slice
      }
    Array(SerialLinesPartition(rows, s"serial:$device"))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[SerialLinesPartition]
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
    val e = end.asInstanceOf[SerialOffset].value
    wal.commit(e)
    val drop = (e - baseOffset).toInt
    if (drop > 0) { buffer.remove(0, math.min(drop, buffer.size)); baseOffset = e }
  }

  override def stop(): Unit = {
    stopped.set(true)
    // a flag alone leaves the reader blocked in in.read() on a quiet
    // tty forever — close the stream to unblock it (same zombie-reader
    // fix as TcpLineMicroBatchStream.stop)
    Option(liveStream.getAndSet(null)).foreach { s =>
      try s.close() catch { case _: java.io.IOException => () }
    }
  }
}

private case class SerialOffset(value: Long) extends Offset {
  override def json(): String = value.toString
}

private case class SerialLinesPartition(rows: Array[(String, Long)], origin: String)
  extends InputPartition
