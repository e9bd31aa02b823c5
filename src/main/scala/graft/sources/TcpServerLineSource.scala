package graft.sources

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket, SocketException}
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

/** S11: TransServer inbound-TCP ingest as a DataSourceV2 micro-batch
  * source — the Spark twin of the reference's TcpServer/TransHandler
  * (`/root/reference/src/io/stream/tcp/TcpServer.java:30`,
  * `TransHandler.java:118-180`): sensors connect *in*, each connection
  * carries its own id and label, and a connected client can retune both
  * in-band with `>>>id:<x>` / `>>>label:<x>` (acked on its own socket,
  * never emitted as data). `>>>?`, `>>>id?`, `>>>label?` answer locally.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.TcpServerLineSource")
  *     .option("port", "5542").option("label", "trans").load()
  * }}}
  *
  * Schema: (line STRING, origin STRING, label STRING, ts TIMESTAMP) —
  * `origin` is the connection id (remote address until `>>>id:` renames
  * it), `label` feeds §2.9 label dispatch downstream.
  *
  * Same driver-buffer + WAL design as [[TcpLineSource]]: arriving lines
  * buffer on the driver, planned batches persist to the checkpoint WAL so
  * a restart replays in-flight micro-batches the sockets cannot re-serve.
  * Edge-connector role (tens of slow shipboard sensors); fleet-scale
  * ingestion goes through Kafka.
  */
class TcpServerLineSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TcpServerLineSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TcpServerLineTable(properties.get("port").toInt,
      Option(properties.get("label")).getOrElse("trans"))
}

object TcpServerLineSource {
  val schema: StructType = StructType(Seq(
    StructField("line", StringType),
    StructField("origin", StringType),
    StructField("label", StringType),
    StructField("ts", TimestampType)))

  // WAL rows are single strings: pack (origin, label, line) with an
  // unlikely-in-text separator so restart replay keeps all three fields
  private[sources] val Sep = '\u0001'
  private[sources] def pack(origin: String, label: String, line: String): String =
    s"$origin$Sep$label$Sep$line"
  private[sources] def unpack(s: String): (String, String, String) = {
    val a = s.indexOf(Sep)
    val b = s.indexOf(Sep, a + 1)
    (s.substring(0, a), s.substring(a + 1, b), s.substring(b + 1))
  }
}

private class TcpServerLineTable(port: Int, defaultLabel: String)
    extends Table with SupportsRead {
  override def name(): String = s"tcp-server://:$port"
  override def schema(): StructType = TcpServerLineSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = TcpServerLineSource.schema
      override def toBatch: Batch = throw new UnsupportedOperationException(
        "graft-tcp-server is streaming-only")
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new TcpServerMicroBatchStream(port, defaultLabel, checkpointLocation)
    }
}

private class TcpServerMicroBatchStream(port: Int, defaultLabel: String,
    checkpointLocation: String) extends MicroBatchStream {

  private case class SrvOffset(value: Long) extends Offset {
    override def json(): String = value.toString
  }

  private val wal = new LineBufferWal(checkpointLocation)
  // packed (originlabelline, arrivalMicros)
  private val buffer = ListBuffer.empty[(String, Long)]
  private var baseOffset = wal.maxPlannedOffset
  private val stopped = new AtomicBoolean(false)
  private val server = new ServerSocket(port)
  private val clients =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[Socket, java.lang.Boolean]())

  private val acceptor = new Thread(s"graft-tcp-server-$port") {
    override def run(): Unit = {
      while (!stopped.get()) {
        try {
          val socket = server.accept()
          clients.add(socket)
          val t = new Thread(() => serve(socket),
            s"graft-trans-${socket.getRemoteSocketAddress}")
          t.setDaemon(true)
          t.start()
        } catch {
          case _: SocketException => // closed during stop()
        }
      }
    }
  }
  acceptor.setDaemon(true)
  acceptor.start()

  /** Per-connection read loop: in-band `>>>` control verbs ack on the
    * connection's own socket (TransHandler.java:122-180); data lines land
    * in the shared buffer stamped with the connection's current id+label.
    */
  private def serve(socket: Socket): Unit = {
    var id = socket.getRemoteSocketAddress.toString
    var label = defaultLabel
    try {
      val in = new BufferedReader(
        new InputStreamReader(socket.getInputStream, StandardCharsets.UTF_8))
      val out = new PrintWriter(
        new java.io.OutputStreamWriter(socket.getOutputStream, StandardCharsets.UTF_8), true)
      var line = in.readLine()
      while (line != null && !stopped.get()) {
        if (line.startsWith(">>>")) {
          val msg = line.substring(3)
          // strip the WAL pack separator from client-settable fields: an
          // id/label containing U+0001 would shift the packed (origin,
          // label, line) fields apart on replay
          if (msg.startsWith("label:")) {
            label = msg.substring(6).replace(TcpServerLineSource.Sep.toString, "")
            out.println(s"Altered label to $label")
          } else if (msg.startsWith("id:")) {
            id = msg.substring(3).replace(TcpServerLineSource.Sep.toString, "")
            out.println(s"Altered id to $id")
          } else if (msg == "id?") out.println(s"id is $id")
          else if (msg == "label?") out.println(s"label is $label")
          else if (msg == "?") {
            out.println(">>>? -> Returns this message")
            out.println(">>>label:newlabel -> Change the label")
            out.println(">>>id:newid -> Change the id")
            out.println(">>>id? -> returns the current id")
            out.println(">>>label? -> returns the current label")
          } else out.println("Unknown command, try >>>? for a list")
        } else {
          val packed = TcpServerLineSource.pack(id, label, line)
          buffer.synchronized {
            buffer += ((packed, System.currentTimeMillis() * 1000L))
          }
        }
        line = in.readLine()
      }
    } catch {
      case _: java.io.IOException => // client went away
    } finally {
      clients.remove(socket)
      try socket.close() catch { case _: Exception => }
    }
  }

  override def initialOffset(): Offset = SrvOffset(wal.committedOffset)
  override def latestOffset(): Offset =
    buffer.synchronized(SrvOffset(baseOffset + buffer.size))
  override def deserializeOffset(json: String): Offset = SrvOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SrvOffset].value
    val e = end.asInstanceOf[SrvOffset].value
    val rows =
      if (s < baseOffset) wal.readRange(s, e) // restart replay
      else buffer.synchronized {
        val slice = buffer.slice((s - baseOffset).toInt, (e - baseOffset).toInt).toArray
        wal.persistBatch(s, e, slice)
        slice
      }
    Array(TransLinesPartition(rows))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[TransLinesPartition]
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < p.rows.length }
        override def get(): InternalRow = {
          val (origin, label, line) = TcpServerLineSource.unpack(p.rows(i)._1)
          InternalRow(
            UTF8String.fromString(line),
            UTF8String.fromString(origin),
            UTF8String.fromString(label),
            p.rows(i)._2)
        }
        override def close(): Unit = {}
      }
    }

  override def commit(end: Offset): Unit = buffer.synchronized {
    val e = end.asInstanceOf[SrvOffset].value
    wal.commit(e)
    val drop = (e - baseOffset).toInt
    if (drop > 0) { buffer.remove(0, math.min(drop, buffer.size)); baseOffset = e }
  }

  override def stop(): Unit = {
    stopped.set(true)
    try server.close() catch { case _: Exception => }
    clients.forEach(s => try s.close() catch { case _: Exception => })
  }
}

private case class TransLinesPartition(rows: Array[(String, Long)])
  extends InputPartition
