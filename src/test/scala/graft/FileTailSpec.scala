package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite

/** FileMonitor tail source (`FileMonitor.java:19-80`): appending to a
  * live file produces rows, partial lines wait for their newline,
  * truncation re-reads from the start, and a kill/restart resumes from
  * the checkpoint without losing or duplicating lines.
  */
class FileTailSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def append(f: Path, s: String): Unit =
    Files.write(f, s.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  test("appended lines arrive; a partial line waits for its newline") {
    val f = Files.createTempFile("graft-tail", ".log")
    append(f, "before-start\n")
    val q = spark.readStream
      .format("graft.sources.FileTailSource")
      .option("path", f.toString).option("pollMillis", "100")
      .option("startat", "begin") // this test tails pre-existing content
      .load()
      .writeStream.format("memory").queryName("tail_out")
      .outputMode("append").start()
    try {
      def rows() = spark.table("tail_out").collect()
        .map(_.getAs[String]("line")).toSeq
      def await(want: Int): Seq[String] = {
        val deadline = System.currentTimeMillis() + 15000
        var r = rows()
        while (r.length < want && System.currentTimeMillis() < deadline) {
          q.processAllAvailable(); Thread.sleep(100); r = rows()
        }
        r
      }
      append(f, "line-1\nline-2\npartial")
      val got = await(3)
      assert(got.sorted == Seq("before-start", "line-1", "line-2"),
        s"partial line must not emit; got $got")
      append(f, "-done\nline-3\n")
      assert(await(5).sorted ==
        Seq("before-start", "line-1", "line-2", "line-3", "partial-done"))

      // truncation = rotation: position resets, replacement re-read
      Files.write(f, "fresh-1\n".getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.TRUNCATE_EXISTING)
      assert(await(6).contains("fresh-1"))
    } finally {
      q.stop()
      Files.deleteIfExists(f)
    }
  }

  test("default startat=eof skips pre-existing history like the reference FileMonitor") {
    val f = Files.createTempFile("graft-tail-eof", ".log")
    append(f, "old-1\nold-2\n") // history that must NOT replay
    val q = spark.readStream
      .format("graft.sources.FileTailSource")
      .option("path", f.toString).option("pollMillis", "100")
      .load()
      .writeStream.format("memory").queryName("tail_eof_out")
      .outputMode("append").start()
    try {
      // wait for the poller thread (it takes its EOF baseline on its
      // first statement), then a beat, then append
      val tDeadline = System.currentTimeMillis() + 10000
      while (!Thread.getAllStackTraces.keySet.toArray(Array.empty[Thread])
          .exists(_.getName == s"graft-tail-$f") &&
          System.currentTimeMillis() < tDeadline) Thread.sleep(50)
      Thread.sleep(400)
      append(f, "new-1\n")
      val deadline = System.currentTimeMillis() + 15000
      def rows() = spark.table("tail_eof_out").collect()
        .map(_.getAs[String]("line")).toSeq
      var r = rows()
      while (!r.contains("new-1") && System.currentTimeMillis() < deadline) {
        q.processAllAvailable(); Thread.sleep(100); r = rows()
      }
      assert(r == Seq("new-1"), s"history must not replay from EOF start: $r")
    } finally {
      q.stop()
      Files.deleteIfExists(f)
    }
  }

  test("kill-and-restart resumes from checkpoint without loss or duplicates") {
    val f = Files.createTempFile("graft-tail-wal", ".log")
    val ckpt = Files.createTempDirectory("graft-tail-ckpt").toFile.getAbsolutePath
    val received = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    def startQuery() = spark.readStream
      .format("graft.sources.FileTailSource")
      .option("path", f.toString).option("pollMillis", "100")
      .option("startat", "begin") // deterministic vs the async EOF baseline
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r => received.add(r.getAs[String]("line")))
      }
      .option("checkpointLocation", ckpt).start()

    def awaitCount(q: org.apache.spark.sql.streaming.StreamingQuery,
        want: Int): Seq[String] = {
      val deadline = System.currentTimeMillis() + 15000
      while (received.size < want && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        if (received.size < want) Thread.sleep(100)
      }
      received.toArray(Array.empty[String]).toSeq
    }

    val q1 = startQuery()
    try {
      append(f, "one\ntwo\n")
      assert(awaitCount(q1, 2).sorted == Seq("one", "two"))
    } finally q1.stop()

    received.clear()
    append(f, "three\nhead-") // offline append ENDS MID-LINE
    val q2 = startQuery()
    try {
      val got = awaitCount(q2, 1)
      assert(got == Seq("three"),
        s"expected only the offline-appended line, got $got")
    } finally q2.stop()

    // the partial "head-" was read into the carry (but not emitted) when
    // q2 died; the persisted position must be newline-aligned so the next
    // incarnation re-reads it and emits the WHOLE line, not just "tail"
    received.clear()
    append(f, "tail\n")
    val q3 = startQuery()
    try {
      val got = awaitCount(q3, 1)
      assert(got == Seq("head-tail"),
        s"partial line's head lost across restart: $got")
    } finally {
      q3.stop()
      Files.deleteIfExists(f)
    }
  }
}
