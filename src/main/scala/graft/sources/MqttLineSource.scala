package graft.sources

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

/** S5: MQTT subscribe micro-batch source — the Spark twin of the
  * reference's MqttWorker subscribe path
  * (`/root/reference/src/io/mqtt/MqttWorker.java:19-58`,
  * `messageArrived`: payload becomes the data line, the topic is the
  * routing label). Same driver-buffered design + checkpoint WAL recovery
  * as [[TcpLineSource]]; reconnects and resubscribes on broker loss.
  *
  * {{{
  * spark.readStream.format("graft.sources.MqttLineSource")
  *   .option("host", "broker").option("port", "1883")
  *   .option("topic", "sensors/#").load()
  * }}}
  *
  * Schema: (line STRING, topic STRING, origin STRING, ts TIMESTAMP).
  */
class MqttLineSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MqttLineSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MqttLineTable(
      properties.get("host"),
      properties.get("port").toInt,
      properties.get("topic"),
      Option(properties.get("clientid")).getOrElse("graft"))
}

object MqttLineSource {
  val schema: StructType = StructType(Seq(
    StructField("line", StringType),
    StructField("topic", StringType),
    StructField("origin", StringType),
    StructField("ts", TimestampType)))
}

private class MqttLineTable(host: String, port: Int, topic: String,
    clientId: String) extends Table with SupportsRead {
  override def name(): String = s"mqtt://$host:$port/$topic"
  override def schema(): StructType = MqttLineSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = MqttLineSource.schema
      override def toBatch: Batch = throw new UnsupportedOperationException(
        "graft-mqtt is streaming-only")
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new MqttLineMicroBatchStream(host, port, topic, clientId, checkpointLocation)
    }
}

private class MqttLineMicroBatchStream(host: String, port: Int, topic: String,
    clientId: String, checkpointLocation: String) extends MicroBatchStream {

  private val wal = new LineBufferWal(checkpointLocation)
  private val buffer = ListBuffer.empty[(String, Long)]
  private var baseOffset = wal.maxPlannedOffset
  private val stopped = new AtomicBoolean(false)

  // stop() closes the live client to unblock readLoop — a flag alone
  // leaves a zombie subscriber consuming broker messages forever
  private val liveClient =
    new java.util.concurrent.atomic.AtomicReference[MqttClientLite]()

  private val reader = new Thread(s"graft-mqtt-$host:$port") {
    override def run(): Unit = {
      while (!stopped.get()) {
        var client: MqttClientLite = null
        try {
          client = new MqttClientLite(host, port, clientId)
          liveClient.set(client)
          // stop() may have raced the connect (its getAndSet(null) saw
          // null and closed nothing) — returning here is safe because
          // the enclosing finally closes `client` on every exit path
          if (stopped.get()) return
          client.subscribe(topic)
          client.readLoop { (t, payload) =>
            val now = System.currentTimeMillis() * 1000L
            buffer.synchronized { buffer += ((s"${MqttTopicCodec.enc(t)}\t$payload", now)) }
          } // returns when the socket drops
        } catch {
          case _: java.io.IOException => // broker down: retry
        } finally {
          if (client != null) try client.close() catch { case _: Throwable => }
        }
        if (!stopped.get()) Thread.sleep(200) // reconnect + resubscribe
      }
    }
  }
  reader.setDaemon(true)
  reader.start()

  // see TcpLineMicroBatchStream.maxServed: a planned range beyond what
  // this instance advertised is a replay of lines the WAL never saw —
  // fail fast instead of substituting post-reconnect lines (round-13)
  @volatile private var maxServed = baseOffset

  override def initialOffset(): Offset = LongOffset(wal.committedOffset)
  override def latestOffset(): Offset = buffer.synchronized {
    val o = baseOffset + buffer.size
    if (o > maxServed) maxServed = o
    LongOffset(o)
  }
  override def deserializeOffset(json: String): Offset = LongOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LongOffset].value
    val e = end.asInstanceOf[LongOffset].value
    val rows =
      if (s < baseOffset) wal.readRange(s, e)
      else if (e > maxServed)
        throw new IllegalStateException(
          s"mqtt source cannot replay [$s,$e): the lines were never " +
          "persisted to the graft WAL and are gone with the connection — " +
          "restart the query from a clean checkpoint")
      else buffer.synchronized {
        val slice = buffer.slice((s - baseOffset).toInt, (e - baseOffset).toInt).toArray
        wal.persistBatch(s, e, slice)
        slice
      }
    Array(MqttLinesPartition(rows, s"mqtt://$host:$port"))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[MqttLinesPartition]
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < p.rows.length }
        override def get(): InternalRow = {
          val (enc, ts) = p.rows(i)
          val tab = enc.indexOf('\t') // first raw tab = separator (topic escaped)
          InternalRow(
            UTF8String.fromString(enc.substring(tab + 1)),
            UTF8String.fromString(MqttTopicCodec.dec(enc.substring(0, tab))),
            UTF8String.fromString(p.origin),
            ts)
        }
        override def close(): Unit = {}
      }
    }

  override def commit(end: Offset): Unit = buffer.synchronized {
    val e = end.asInstanceOf[LongOffset].value
    wal.commit(e)
    val drop = (e - baseOffset).toInt
    if (drop > 0) { buffer.remove(0, math.min(drop, buffer.size)); baseOffset = e }
  }

  override def stop(): Unit = {
    stopped.set(true)
    Option(liveClient.getAndSet(null)).foreach { c =>
      try c.close() catch { case _: Throwable => () }
    }
  }
}

private case class MqttLinesPartition(rows: Array[(String, Long)], origin: String)
  extends InputPartition

/** Buffer/WAL rows are "topic\tpayload", split on the FIRST raw tab; tabs
  * and backslashes in the topic (legal per the MQTT spec) are escaped so
  * the split point is unambiguous — payloads need no escaping. Standalone
  * object: the decode side runs inside the executor's PartitionReader.
  */
private object MqttTopicCodec extends Serializable {
  def enc(t: String): String =
    t.replace("\\", "\\\\").replace("\t", "\\t")
  def dec(t: String): String = {
    val sb = new StringBuilder(t.length)
    var i = 0
    while (i < t.length) {
      val ch = t.charAt(i)
      if (ch == '\\' && i + 1 < t.length) {
        t.charAt(i + 1) match {
          case 't' => sb.append('\t'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case _ => sb.append(ch); i += 1
        }
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }
}
