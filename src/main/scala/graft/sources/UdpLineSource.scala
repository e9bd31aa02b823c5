package graft.sources

import java.net.{DatagramPacket, DatagramSocket}
import java.nio.charset.StandardCharsets
import java.util
import java.util.concurrent.atomic.AtomicBoolean

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** S2: UDP datagram-to-lines micro-batch source (reference:
  * `/root/reference/src/io/stream/udp/UdpServer.java`,
  * `StreamManager.java:435-447`). Binds a local port, splits each
  * datagram payload on newlines. Same driver-buffered micro-batch design
  * as [[TcpLineSource]].
  *
  * `spark.readStream.format("graft.sources.UdpLineSource")
  *   .option("port", "4010").load()`
  */
class UdpLineSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TcpLineSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new UdpLineTable(properties.get("port").toInt)
}

private class UdpLineTable(port: Int) extends Table with SupportsRead {
  override def name(): String = s"udp://$port"
  override def schema(): StructType = TcpLineSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = TcpLineSource.schema
      override def toBatch: Batch = throw new UnsupportedOperationException(
        "graft-udp is streaming-only")
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new UdpLineMicroBatchStream(port, checkpointLocation)
    }
}

private class UdpLineMicroBatchStream(port: Int, checkpointLocation: String)
    extends MicroBatchStream {

  // checkpoint WAL + offset resume — same recovery design as TcpLineSource
  private val wal = new LineBufferWal(checkpointLocation)
  private val buffer = ListBuffer.empty[(String, Long)]
  private var baseOffset = wal.maxPlannedOffset
  private val stopped = new AtomicBoolean(false)
  private val socket = new DatagramSocket(port)

  private val reader = new Thread(s"graft-udp-$port") {
    override def run(): Unit = {
      val buf = new Array[Byte](65536)
      while (!stopped.get()) {
        try {
          val packet = new DatagramPacket(buf, buf.length)
          socket.receive(packet)
          val now = System.currentTimeMillis() * 1000L
          val text = new String(packet.getData, packet.getOffset,
            packet.getLength, StandardCharsets.UTF_8)
          val lines = text.split("\n").filter(_.nonEmpty)
          buffer.synchronized { lines.foreach(l => buffer += ((l, now))) }
        } catch {
          case _: java.io.IOException if stopped.get() => // closing
          case _: java.io.IOException => Thread.sleep(100)
        }
      }
    }
  }
  reader.setDaemon(true)
  reader.start()

  override def initialOffset(): Offset = UdpOffset(wal.committedOffset)
  override def latestOffset(): Offset =
    buffer.synchronized(UdpOffset(baseOffset + buffer.size))
  override def deserializeOffset(json: String): Offset = UdpOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[UdpOffset].value
    val e = end.asInstanceOf[UdpOffset].value
    val rows =
      if (s < baseOffset) wal.readRange(s, e) // restart replay
      else buffer.synchronized {
        val slice = buffer.slice((s - baseOffset).toInt, (e - baseOffset).toInt).toArray
        wal.persistBatch(s, e, slice)
        slice
      }
    Array(UdpLinesPartition(rows, s"udp:$port"))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[UdpLinesPartition]
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
    val e = end.asInstanceOf[UdpOffset].value
    wal.commit(e)
    val drop = (e - baseOffset).toInt
    if (drop > 0) { buffer.remove(0, math.min(drop, buffer.size)); baseOffset = e }
  }

  override def stop(): Unit = {
    stopped.set(true)
    socket.close()
  }
}

private case class UdpOffset(value: Long) extends Offset {
  override def json(): String = value.toString
}

private case class UdpLinesPartition(rows: Array[(String, Long)], origin: String)
  extends InputPartition
