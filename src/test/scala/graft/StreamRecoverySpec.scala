package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 verdict task 6: QUERY-LEVEL crash recovery. The sources have
  * WAL specs, but nothing restarted a checkpointed streaming query mid-
  * replay — the state store reload, the file-source offset log, and the
  * sink's exactly-once commit had never been exercised across a stop.
  *
  * Shape of every case: replay chunks 0..k through a checkpointed query,
  * STOP it with a published-but-unprocessed chunk pending (the crash —
  * the offset log has not seen that file), restart from the same
  * checkpoint, replay the rest, and pin the final sink contents equal to
  * an UNINTERRUPTED run of the identical pipeline.
  */
class StreamRecoverySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("complete-mode native KMV sketch recovers its state store across a restart") {
    val rows = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("user_id"))
      .filter(col("user_id").isNotNull)
    def agg(in: DataFrame): DataFrame = in
      .withColumn("hv",
        conv(substring(md5(concat(col("event_type"), lit(":"),
          col("user_id").cast("string"))), 1, 7), 16, 10).cast("long"))
      .groupBy("event_type")
      .agg(org.apache.spark.sql.graft.KmvAgg
        .kmvMinhashes(col("hv"), col("user_id"), 64).as("sketch"))

    // uninterrupted reference run (its own checkpoint + sink)
    val refReplay = graft.streaming.FileReplay.stage(rows,
      graft.streaming.FileReplay.rangeChunks(rows, col("user_id"), 6))
    val refCp = Files.createTempDirectory("graft_cp_ref").toString
    val qRef = agg(refReplay.stream).writeStream.format("memory")
      .queryName("recover_kmv_ref").outputMode("complete")
      .option("checkpointLocation", refCp).start()
    val reference =
      try { refReplay.feedAll(qRef); sorted(spark.table("recover_kmv_ref")) }
      finally { qRef.stop(); refReplay.close() }
    assert(reference.nonEmpty)

    // interrupted run: chunks 0-2, crash with chunk 3 published but
    // UNSEEN by the offset log, restart from the checkpoint, chunks 3-5
    val replay = graft.streaming.FileReplay.stage(rows,
      graft.streaming.FileReplay.rangeChunks(rows, col("user_id"), 6))
    val cp = Files.createTempDirectory("graft_cp_kmv").toString
    def start() = agg(replay.stream).writeStream.format("memory")
      .queryName("recover_kmv").outputMode("complete")
      .option("checkpointLocation", cp).start()
    val ids = replay.chunkIds
    val q1 = start()
    try ids.take(3).foreach(replay.feed(q1, _))
    finally q1.stop()
    // publish AFTER the stop: the query is dead, so the chunk is
    // deterministically pending (publishing before the stop races a
    // micro-batch trigger that could commit it to the offset log and
    // quietly degrade the test to "nothing was in flight")
    replay.publish(ids(3))
    val q2 = start() // restart: reload state, pick up the pending file
    try {
      q2.processAllAvailable()
      ids.drop(4).foreach(replay.feed(q2, _))
      // the TypedImperativeAggregate buffers round-tripped the state
      // store across a process-lifetime boundary; a re-processed or
      // dropped chunk would shift the sketch's order statistics
      assert(sorted(spark.table("recover_kmv")) == reference)
    } finally {
      q2.stop()
      replay.close()
      spark.catalog.dropTempView("recover_kmv")
      spark.catalog.dropTempView("recover_kmv_ref")
    }
  }

  test("append-mode watermarked window counts commit exactly once across a restart") {
    val rows = Tables.load(spark, sf, "events")
      .select(col("ts"), col("event_type"))
      .filter(col("ts").isNotNull)
    def agg(in: DataFrame): DataFrame = in
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()
      .select(col("window.start").cast("long").as("ws"),
        col("event_type"), col("count"))

    def run(interrupted: Boolean): Seq[String] = {
      val replay = graft.streaming.FileReplay.stage(rows,
        graft.streaming.FileReplay.rangeChunks(rows, col("ts"), 6))
      val cp = Files.createTempDirectory("graft_cp_win").toString
      val out = Files.createTempDirectory("graft_sink_win").toString
      def start() = agg(replay.stream).writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").start()
      val ids = replay.chunkIds
      try {
        if (!interrupted) { val q = start(); try replay.feedAll(q) finally q.stop() }
        else {
          val q1 = start()
          try ids.take(3).foreach(replay.feed(q1, _))
          finally q1.stop()
          replay.publish(ids(3)) // deterministically pending (see above)
          val q2 = start()
          try { q2.processAllAvailable(); ids.drop(4).foreach(replay.feed(q2, _)) }
          finally q2.stop()
        }
        // read through the sink's metadata log, exactly as a consumer
        // would: a batch committed twice (or a lost commit) shows here
        sorted(spark.read.parquet(out))
      } finally replay.close()
    }

    val reference = run(interrupted = false)
    assert(reference.nonEmpty,
      "watermark must finalize at least one window during the replay")
    assert(run(interrupted = true) == reference)
  }
}
