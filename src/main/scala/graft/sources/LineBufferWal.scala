package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

/** Checkpoint persistence for driver-buffered line sources (TCP/UDP).
  *
  * The reference's streams reconnect and resume
  * (`/root/reference/src/io/stream/BaseStream.java:97-103`); a Spark
  * restart additionally replays the last planned-but-uncommitted
  * micro-batch from the checkpoint, which a socket cannot re-serve. This
  * WAL closes that hole: every planned batch slice is persisted under
  * `<checkpoint>/graft-wal/` before it is handed to executors, the
  * committed offset is persisted on commit, and a restarted stream
  *  - resumes numbering new arrivals after the highest planned offset
  *    (no silent skip/misalignment from a reset base offset), and
  *  - serves replayed ranges from the WAL instead of the dead buffer.
  * Committed WAL segments are deleted on commit, so the directory holds
  * at most the in-flight batches.
  */
private[sources] class LineBufferWal(checkpointLocation: String) {

  // the location Spark hands to toMicroBatchStream is a URI ("file:/…")
  private val root: Path = {
    val u = java.net.URI.create(checkpointLocation)
    if (u.getScheme == null) Paths.get(checkpointLocation) else Paths.get(u.getPath)
  }
  private val dir: Path = root.resolve("graft-wal")
  Files.createDirectories(dir)
  private val committedFile = dir.resolve("committed")

  /** Last committed offset persisted by a previous run (0 on first run). */
  val committedOffset: Long =
    if (Files.exists(committedFile))
      new String(Files.readAllBytes(committedFile), StandardCharsets.UTF_8).trim.toLong
    else 0L

  private def segments(): Seq[(Long, Long, Path)] = {
    val stream = Files.list(dir) // close it: this runs once per micro-batch
    try stream.iterator().asScala
      .flatMap { p =>
        p.getFileName.toString match {
          case s if s.endsWith(".wal") =>
            val parts = s.stripSuffix(".wal").split("-")
            Some((parts(0).toLong, parts(1).toLong, p))
          case _ => None
        }
      }.toSeq.sortBy(_._1)
    finally stream.close()
  }

  /** Highest offset any previous run planned (>= committedOffset). New
    * arrivals must be numbered after this.
    */
  val maxPlannedOffset: Long =
    (committedOffset +: segments().map(_._2)).max

  // payloads may contain newlines (MQTT): escape them so one WAL row
  // stays one physical line
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\n", "\\n").replace("\r", "\\r")
  private def unesc(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case other => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Persist a planned batch slice [start, end) before execution.
    *
    * `header`: optional source-defined recovery record written as the
    * segment's first line (`#hdr\t<value>`), ATOMICALLY with the rows
    * (single tmp+move). FileTailSource stores its tail-file byte position
    * here: a crash between this write and any separate position file can
    * then no longer resurrect already-WAL'd lines as fresh offsets —
    * restart recovery reads the header back via [[maxHeader]].
    */
  def persistBatch(start: Long, end: Long, rows: Array[(String, Long)],
      header: Option[String] = None): Unit = {
    if (end <= start) return
    val f = dir.resolve(s"$start-$end.wal")
    if (!Files.exists(f)) {
      val body = (header.map(h => s"#hdr\t${esc(h)}").toSeq ++
        rows.map { case (line, ts) => s"$ts\t${esc(line)}" }).mkString("\n")
      val tmp = dir.resolve(s".$start-$end.tmp")
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      Files.move(tmp, f)
    }
  }

  /** Header of the highest-offset surviving segment that has one (None if
    * no segment carries a header — e.g. all were committed and deleted).
    */
  def maxHeader: Option[String] =
    segments().reverseIterator.flatMap { case (_, _, p) =>
      val in = Files.newBufferedReader(p, StandardCharsets.UTF_8)
      try {
        val first = in.readLine()
        if (first != null && first.startsWith("#hdr\t"))
          Some(unesc(first.substring(5)))
        else None
      } finally in.close()
    }.nextOption()

  /** Serve a replayed range [start, end) from persisted segments. Fails
    * fast (instead of silently skipping) if the range is not covered.
    */
  def readRange(start: Long, end: Long): Array[(String, Long)] = {
    if (end <= start) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[(String, Long)]()
    var cursor = start
    segments().foreach { case (s, e, p) =>
      if (cursor < end && s <= cursor && cursor < e) {
        val raw =
          new String(Files.readAllBytes(p), StandardCharsets.UTF_8) match {
            case "" => Array.empty[String]
            case body => body.split("\n", -1)
          }
        // a leading `#hdr` recovery record is metadata, not a row
        val lines =
          if (raw.nonEmpty && raw(0).startsWith("#hdr\t")) raw.drop(1) else raw
        val from = (cursor - s).toInt
        val to = (math.min(e, end) - s).toInt
        lines.slice(from, to).foreach { l =>
          val tab = l.indexOf('\t')
          out += ((unesc(l.substring(tab + 1)), l.substring(0, tab).toLong))
        }
        cursor = math.min(e, end)
      }
    }
    require(cursor >= end,
      s"graft WAL cannot replay offsets [$start,$end): checkpoint has data " +
        s"only up to $cursor — the socket cannot re-serve lost lines")
    out.toArray
  }

  /** Persist the committed offset and drop fully-committed segments. */
  def commit(offset: Long): Unit = {
    val tmp = dir.resolve(".committed.tmp")
    Files.write(tmp, offset.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, committedFile,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    segments().filter(_._2 <= offset).foreach(s => Files.deleteIfExists(s._3))
  }
}
