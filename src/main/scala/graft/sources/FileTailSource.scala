package graft.sources

import java.io.RandomAccessFile
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
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

/** FileMonitor: tail a *growing* file as a DataSourceV2 micro-batch
  * source — the Spark twin of the reference's FileMonitor
  * (`/root/reference/src/util/tools/FileMonitor.java:19-80`, wired in
  * `das/DAS.java:206-208` from the `<monitor>` settings node): an
  * instrument writes one live log; every appended complete line becomes a
  * row. Distinct from `LineSources.fileReplay`, which ingests *closed*
  * files dropped into a directory.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.FileTailSource")
  *     .option("path", "/data/ctd.log").option("pollMillis", "250").load()
  * }}}
  *
  * Schema: (line STRING, origin STRING, ts TIMESTAMP), origin = path.
  *
  * Tail semantics: only complete (newline-terminated) lines are emitted —
  * a partially-written last line stays in a carry buffer until its
  * newline arrives (the reference's 256-byte read loop behaves the same
  * way at EOL boundaries). Truncation/rotation (file shrinks) resets the
  * read position to 0, picking up the replacement file from its start.
  * A fresh tail (no checkpoint) starts at the file's current END like the
  * reference (`FileMonitor.java` calls `updatePosition()` before watching,
  * so pre-existing history is not replayed); pass `startat=begin` to
  * ingest the whole existing file instead.
  *
  * Same driver-buffer + WAL design as [[TcpLineSource]], with the
  * persisted file position advanced ONLY when the lines it covers have
  * reached the checkpoint WAL (in `planInputPartitions`) — never by the
  * poller. A hard crash (kill -9) between reading lines and planning them
  * therefore re-reads those lines from the file on restart instead of
  * skipping past them. The position is persisted ATOMICALLY with the WAL
  * batch (inside the segment header, one tmp+move) and mirrored to a
  * side file once segments are committed away, so there is no window
  * where lines are WAL'd but the position is stale (which would replay
  * them as duplicate new offsets). Both records also carry the tailed
  * file's identity key (inode); restart recovery discards a position
  * whose key no longer matches the file on disk — a rotation during
  * downtime restarts the replacement file from 0 instead of landing the
  * stale old-file offset mid-file (head loss). Remaining at-least-once
  * corner, shared with the reference's FileMonitor: a LIVE rotation the
  * poller only detects by the length heuristic (replacement at least as
  * long as the old position with a recycled inode skips the overlap).
  * The driver buffer is bounded (`maxBufferedLines`,
  * default 100000): the poller pauses reading until the stream drains,
  * so pointing a fresh `startat=begin` tail at a huge live log cannot
  * balloon the driver heap.
  */
class FileTailSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileTailSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // properties is the original-cased map; wrap so `.option("pollMillis")`
    // and `.option("maxBufferedLines")` match regardless of caller casing
    // (was: a mixed-case lookup for one key, lowercase-only for another).
    val opts = new CaseInsensitiveStringMap(properties)
    new FileTailTable(opts.get("path"),
      Option(opts.get("pollmillis")).map(_.toLong).getOrElse(250L),
      Option(opts.get("startat")).map(_.toLowerCase).getOrElse("eof"),
      Option(opts.get("maxbufferedlines")).map(_.toInt).getOrElse(100000))
  }
}

object FileTailSource {
  val schema: StructType = StructType(Seq(
    StructField("line", StringType),
    StructField("origin", StringType),
    StructField("ts", TimestampType)))
}

private class FileTailTable(path: String, pollMillis: Long, startAt: String,
    maxBufferedLines: Int) extends Table with SupportsRead {
  override def name(): String = s"tail://$path"
  override def schema(): StructType = FileTailSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = FileTailSource.schema
      override def toBatch: Batch = throw new UnsupportedOperationException(
        "graft-file-tail is streaming-only")
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new FileTailMicroBatchStream(path, pollMillis, startAt, maxBufferedLines,
          checkpointLocation)
    }
}

private class FileTailMicroBatchStream(path: String, pollMillis: Long,
    startAt: String, maxBufferedLines: Int,
    checkpointLocation: String) extends MicroBatchStream {

  private case class TailOffset(value: Long) extends Offset {
    override def json(): String = value.toString
  }

  private val wal = new LineBufferWal(checkpointLocation)
  // (line, arrivalMicros, fileEndPos, fileKey): the byte position just
  // past the line's newline plus the identity key of the file the bytes
  // were READ from — the planner persists both together. Pre-fix the
  // planner stamped the key at PLAN time, so across a live rotation the
  // old file's offset was persisted under the NEW file's key, exactly
  // the head-loss the key exists to prevent (round-13 review).
  private val buffer = ListBuffer.empty[(String, Long, Long, String)]
  private var baseOffset = wal.maxPlannedOffset
  private val stopped = new AtomicBoolean(false)

  // byte position survives restarts alongside the WAL. The authoritative
  // copy rides inside each WAL segment header (written atomically with the
  // rows in planInputPartitions); this side file mirrors it so the
  // position survives segments being committed and deleted. Both records
  // are "<pos>\t<fileKey>" — the identity key rejects a position that
  // belongs to a rotated-away file.
  private val posFile = {
    val u = java.net.URI.create(checkpointLocation)
    val root =
      if (u.getScheme == null) Paths.get(checkpointLocation) else Paths.get(u.getPath)
    Files.createDirectories(root.resolve("graft-wal"))
    root.resolve("graft-wal").resolve("tail-position")
  }

  /** Identity key (dev+inode on POSIX) of the tailed file, "" if gone. */
  private def fileKey(): String =
    try Files.readAttributes(Paths.get(path),
      classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey() match {
      case null => ""
      case k => k.toString
    } catch { case _: java.io.IOException => "" }

  /** None on a torn/empty record (crash mid side-file write): an
    * unguarded toLong would throw before the poll loop and silently
    * kill the poller thread — a source that runs forever producing
    * zero rows. The recovery fold then uses the WAL-header copy, which
    * is the valid twin a torn side file always has.
    */
  private def parsePosRecord(rec: String): Option[(Long, String)] =
    try {
      val tab = rec.indexOf('\t')
      if (tab < 0) {
        val t = rec.trim
        if (t.isEmpty) None else Some((t.toLong, "")) // pre-upgrade record
      } else Some((rec.substring(0, tab).toLong, rec.substring(tab + 1)))
    } catch { case _: NumberFormatException => None }

  private val poller = new Thread(s"graft-tail-$path") {
    override def run(): Unit = {
      // recover from the WAL header FIRST (written atomically with the
      // rows it covers — always the authoritative copy when any segment
      // is live), side file only when every segment was committed away.
      // NOT max-position (round-13 review): positions restart at 0 on
      // rotation, so "largest position wins" let a stale pre-rotation
      // side-file record beat the correct post-rotation header — the
      // exact lines-WAL'd-but-position-stale window the design claims
      // cannot exist. Recovery reads retry on IOException instead of
      // killing the poller thread before its guarded loop (a source
      // that runs forever producing zero rows — same class the
      // parsePosRecord guard was added for).
      var recovered: Option[(Long, String)] = None
      var recoveredOk = false
      while (!recoveredOk && !stopped.get()) {
        try {
          recovered = wal.maxHeader.flatMap(parsePosRecord)
            .orElse(
              if (Files.exists(posFile))
                parsePosRecord(new String(Files.readAllBytes(posFile),
                  StandardCharsets.UTF_8))
              else None)
          recoveredOk = true
        } catch {
          case e: java.io.IOException =>
            System.err.println(s"[tail] recovery read failed (retrying): $e")
            Thread.sleep(pollMillis)
        }
      }
      var pos: Long = recovered match {
        // identity mismatch = the file was rotated while we were down:
        // its replacement starts over at 0 (old-file offsets would land
        // mid-file and skip the replacement's head)
        case Some((p, key)) if key.isEmpty || key == fileKey() => p
        case Some(_) => 0L
        case None =>
          if (startAt != "begin" && Files.exists(Paths.get(path)))
            Files.size(Paths.get(path)) // reference FileMonitor: tail from EOF
          else 0L
      }
      val carry = new java.io.ByteArrayOutputStream
      while (!stopped.get()) {
        try {
          val f = Paths.get(path)
          if (Files.exists(f)) {
            val len = Files.size(f)
            if (len < pos) { pos = 0; carry.reset() } // rotated/truncated
            // backpressure: stop reading past the buffer bound and let
            // the stream drain first (startat=begin on a huge live log)
            if (len > pos && buffer.synchronized(buffer.size) < maxBufferedLines) {
              // identity of the file these bytes come from, captured at
              // READ time (see the buffer comment)
              val readKey = fileKey()
              val raf = new RandomAccessFile(path, "r")
              try {
                raf.seek(pos)
                val chunk = new Array[Byte](math.min(len - pos, 1 << 20).toInt)
                val n = raf.read(chunk)
                // the file can shrink between Files.size and the read:
                // read returns -1 and `pos += n` would DECREMENT pos off
                // its newline alignment (round-13 review) — skip; the
                // next poll's len<pos check handles the truncation.
                // readKey was a path-based stat taken BEFORE the open: a
                // rotation in that window reads the REPLACEMENT file's
                // bytes at the old offset while stamping them with the
                // old file's key — the planner could then persist a wrong
                // position under a stale key (round-13 ADVICE). Re-check
                // the identity after the read and discard the chunk on
                // mismatch; the next poll re-stats and starts the
                // replacement at 0 via the len<pos reset.
                if (n > 0 && fileKey() == readKey) {
                  var i = 0
                  while (i < n) {
                    val b = chunk(i)
                    if (b == '\n') {
                      val lineBytes = carry.toByteArray
                      carry.reset()
                      val line = new String(lineBytes, StandardCharsets.UTF_8)
                        .stripSuffix("\r")
                      buffer.synchronized {
                        buffer += ((line, System.currentTimeMillis() * 1000L,
                          pos + i + 1, readKey))
                      }
                    } else {
                      carry.write(b)
                      // the carry is exempt from maxBufferedLines (it is
                      // not a line yet), so a newline-free file would
                      // grow it without bound — flush an oversized
                      // partial as a line like other tailers do (the
                      // endPos is then mid-line: at-least-once re-read
                      // on restart, never driver OOM; round-13 review)
                      if (carry.size >= (4 << 20)) {
                        val line = new String(carry.toByteArray,
                          StandardCharsets.UTF_8)
                        carry.reset()
                        buffer.synchronized {
                          buffer += ((line, System.currentTimeMillis() * 1000L,
                            pos + i + 1, readKey))
                        }
                      }
                    }
                    i += 1
                  }
                  pos += n
                }
              } finally raf.close()
            }
          }
        } catch {
          case _: java.io.IOException => // transient: retry next poll
        }
        if (!stopped.get()) Thread.sleep(pollMillis)
      }
    }
  }
  poller.setDaemon(true)
  poller.start()

  override def initialOffset(): Offset = TailOffset(wal.committedOffset)
  override def latestOffset(): Offset =
    buffer.synchronized(TailOffset(baseOffset + buffer.size))
  override def deserializeOffset(json: String): Offset = TailOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TailOffset].value
    val e = end.asInstanceOf[TailOffset].value
    val rows =
      if (s < baseOffset) wal.readRange(s, e) // restart replay
      else buffer.synchronized {
        val slice = buffer.slice((s - baseOffset).toInt, (e - baseOffset).toInt).toArray
        val pairs = slice.map(t => (t._1, t._2))
        // position record (pos just past the last line's '\n', so
        // newline-aligned by construction) travels INSIDE the segment —
        // same tmp+move as the rows — then mirrors to the side file for
        // after the segment is committed away
        val posRecord = slice.lastOption.map(last => s"${last._3}\t${last._4}")
        wal.persistBatch(s, e, pairs, posRecord)
        posRecord.foreach { rec =>
          // tmp + atomic move: a direct write torn by a crash leaves a
          // partial number the recovery parse must then discard
          val tmp = posFile.resolveSibling(posFile.getFileName.toString + ".tmp")
          Files.write(tmp, rec.getBytes(StandardCharsets.UTF_8))
          Files.move(tmp, posFile,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        pairs
      }
    Array(TailLinesPartition(rows, path))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[TailLinesPartition]
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
    val e = end.asInstanceOf[TailOffset].value
    wal.commit(e)
    val drop = (e - baseOffset).toInt
    if (drop > 0) { buffer.remove(0, math.min(drop, buffer.size)); baseOffset = e }
  }

  override def stop(): Unit = stopped.set(true)
}

private case class TailLinesPartition(rows: Array[(String, Long)], origin: String)
  extends InputPartition
