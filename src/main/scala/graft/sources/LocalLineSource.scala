package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.LinkedBlockingQueue

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** In-process loopback bus: named channels over which one path's OUTPUT
  * re-enters the engine as another path's SOURCE without a socket — the
  * Spark twin of the reference's LocalStream
  * (`/root/reference/src/io/stream/LocalStream.java:12-19`: a Writable
  * whose written data is re-queued as a Datagram under the stream's
  * label; serial↔tcp converter chains use it as their glue). The network
  * form of write-back is K9 `LineSinks.socketWriter`; this is the
  * socketless form.
  *
  * Driver-local by design, like the console plane: `LineSinks.loopback`
  * pushes from a foreachBatch body (driver-side even on a cluster) and
  * the subscribing source buffers on the driver — one process, exactly
  * the reference's in-JVM semantics. Lines pushed while no stream is
  * subscribed park in a BOUNDED pending queue (oldest dropped beyond
  * `maxPending`) so an unconsumed loopback cannot balloon the heap.
  */
object LocalLineBus {
  private val maxPending = 100000
  private val pending =
    new ConcurrentHashMap[String, LinkedBlockingQueue[(String, Long)]]()
  private val subscribers =
    new ConcurrentHashMap[String, java.util.concurrent.CopyOnWriteArraySet[(String, Long) => Unit]]()

  private def pendingQueue(id: String): LinkedBlockingQueue[(String, Long)] =
    pending.computeIfAbsent(id, _ => new LinkedBlockingQueue[(String, Long)]())

  /** Re-inject one line into channel `id` (timestamp = now, micros). */
  def push(id: String, line: String): Unit = push(id, line,
    System.currentTimeMillis() * 1000L)

  // push and subscribe share one monitor: unsynchronized, a line pushed
  // between subscribe's pending-drain and its subs.add would see an
  // empty subscriber set and strand itself in the pending queue until
  // the NEXT restart — silent delay plus reordering on the loopback.
  // Coarse locking is fine at loopback line rates.
  def push(id: String, line: String, tsMicros: Long): Unit = synchronized {
    val subs = subscribers.get(id)
    if (subs != null && !subs.isEmpty) subs.forEach(f => f(line, tsMicros))
    else {
      val q = pendingQueue(id)
      while (q.size >= maxPending) q.poll()
      q.offer((line, tsMicros))
      ()
    }
  }

  /** Attach a consumer; parked pending lines drain to it first, in push
    * order, so a path wired sink-first loses nothing.
    */
  def subscribe(id: String, f: (String, Long) => Unit): Unit = synchronized {
    val subs = subscribers.computeIfAbsent(id,
      _ => new java.util.concurrent.CopyOnWriteArraySet[(String, Long) => Unit]())
    val q = pending.get(id)
    if (q != null) {
      var e = q.poll()
      while (e != null) { f(e._1, e._2); e = q.poll() }
    }
    subs.add(f)
    ()
  }

  def unsubscribe(id: String, f: (String, Long) => Unit): Unit = {
    val subs = subscribers.get(id)
    if (subs != null) { subs.remove(f); () }
  }
}

/** The source half of the loopback: a DataSourceV2 micro-batch stream fed
  * by [[LocalLineBus]]. Same driver-buffer + WAL replay discipline as
  * [[TcpLineSource]] (a restart replays planned-but-uncommitted batches
  * from the checkpoint instead of losing them).
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.LocalLineSource")
  *     .option("id", "loop1").option("label", "converted").load()
  * }}}
  *
  * Schema: (line STRING, origin STRING, ts TIMESTAMP, label STRING) —
  * origin is `local:<id>`; `label` is the configured routing label every
  * re-injected row carries (the reference LocalStream's constructor
  * label), which downstream label dispatch branches on.
  */
class LocalLineSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LocalLineSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new LocalLineTable(opts.get("id"),
      Option(opts.get("label")).getOrElse(""))
  }
}

object LocalLineSource {
  val schema: StructType = StructType(Seq(
    StructField("line", StringType),
    StructField("origin", StringType),
    StructField("ts", TimestampType),
    StructField("label", StringType)))
}

private class LocalLineTable(id: String, label: String)
    extends Table with SupportsRead {
  require(id != null && id.nonEmpty, "graft-local needs .option(\"id\", ...)")
  override def name(): String = s"local://$id"
  override def schema(): StructType = LocalLineSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = LocalLineSource.schema
      override def toBatch: Batch = throw new UnsupportedOperationException(
        "graft-local is streaming-only")
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new LocalLineMicroBatchStream(id, label, checkpointLocation)
    }
}

private case class LocalOffset(value: Long) extends Offset {
  override def json(): String = value.toString
}

private class LocalLineMicroBatchStream(id: String, label: String,
    checkpointLocation: String) extends MicroBatchStream {

  private val wal = new LineBufferWal(checkpointLocation)
  private val buffer = ListBuffer.empty[(String, Long)]
  private var baseOffset = wal.maxPlannedOffset

  private val consumer: (String, Long) => Unit = (line, ts) =>
    buffer.synchronized { buffer += ((line, ts)); () }
  LocalLineBus.subscribe(id, consumer)

  override def initialOffset(): Offset = LocalOffset(wal.committedOffset)
  override def latestOffset(): Offset =
    buffer.synchronized(LocalOffset(baseOffset + buffer.size))
  override def deserializeOffset(json: String): Offset = LocalOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LocalOffset].value
    val e = end.asInstanceOf[LocalOffset].value
    val rows =
      if (s < baseOffset) wal.readRange(s, e) // restart replay
      else buffer.synchronized {
        val slice = buffer.slice((s - baseOffset).toInt, (e - baseOffset).toInt).toArray
        wal.persistBatch(s, e, slice)
        slice
      }
    Array(LocalLinesPartition(rows, s"local:$id", label))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[LocalLinesPartition]
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < p.rows.length }
        override def get(): InternalRow = InternalRow(
          UTF8String.fromString(p.rows(i)._1),
          UTF8String.fromString(p.origin),
          p.rows(i)._2,
          UTF8String.fromString(p.label))
        override def close(): Unit = {}
      }
    }

  override def commit(end: Offset): Unit = buffer.synchronized {
    val e = end.asInstanceOf[LocalOffset].value
    wal.commit(e)
    val drop = (e - baseOffset).toInt
    if (drop > 0) { buffer.remove(0, math.min(drop, buffer.size)); baseOffset = e }
  }

  override def stop(): Unit = LocalLineBus.unsubscribe(id, consumer)
}

private case class LocalLinesPartition(rows: Array[(String, Long)],
  origin: String, label: String) extends InputPartition
