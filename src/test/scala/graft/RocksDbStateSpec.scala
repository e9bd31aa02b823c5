package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The PRODUCTION state-store backend: at 100 TB of keyed state the
  * deployment choice is RocksDB (bounded executor heap, state spills to
  * native memory + local disk), not the default heap-backed
  * HDFSBackedStateStore the parity rows run on. This spec pins that the
  * native TypedImperativeAggregate buffers (TopKAgg) round-trip the
  * RocksDB provider identically — same final complete-mode result as
  * (a) the heap-backed run and (b) a checkpoint RESTART under RocksDB
  * (the provider's own recovery path: version reload from the
  * checkpoint + changelog).
  */
class RocksDbStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val providerConf = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def withProvider[A](value: Option[String])(body: => A): A = {
    val prev = spark.conf.getOption(providerConf)
    value match {
      case Some(v) => spark.conf.set(providerConf, v)
      case None => spark.conf.unset(providerConf)
    }
    try body
    finally prev match {
      case Some(v) => spark.conf.set(providerConf, v)
      case None => spark.conf.unset(providerConf)
    }
  }

  private def rows = Tables.load(spark, sf, "events")
    .filter(col("value").isNotNull && col("event_id").isNotNull)
    .select(col("event_type"), col("event_id"), col("value"))

  private def agg(in: DataFrame): DataFrame = in
    .groupBy("event_type")
    .agg(org.apache.spark.sql.graft.TopKAgg
      .topkEntries(col("value"), col("event_id"), 5).as("tk"))

  private def run(sink: String, interrupted: Boolean): Seq[String] = {
    val replay = graft.streaming.FileReplay.stage(rows,
      graft.streaming.FileReplay.rangeChunks(rows, col("event_id"), 6))
    val cp = Files.createTempDirectory("graft_cp_rocks").toString
    def start() = agg(replay.stream).writeStream.format("memory")
      .queryName(sink).outputMode("complete")
      .option("checkpointLocation", cp).start()
    try {
      if (!interrupted) {
        val q = start(); try replay.feedAll(q) finally q.stop()
      } else {
        val ids = replay.chunkIds
        val q1 = start()
        try ids.take(3).foreach(replay.feed(q1, _))
        finally q1.stop()
        replay.publish(ids(3)) // deterministically pending (StreamRecoverySpec)
        val q2 = start()
        try { q2.processAllAvailable(); ids.drop(4).foreach(replay.feed(q2, _)) }
        finally q2.stop()
      }
      val out = sorted(spark.table(sink)
        .select(col("event_type"), posexplode(col("tk"))))
      spark.catalog.dropTempView(sink)
      out
    } finally replay.close()
  }

  test("KmvAgg state through RocksDB equals the heap-backed provider") {
    // the OTHER TypedImperativeAggregate family: KMV's variable-length
    // long-array buffers through the RocksDB value serde
    def kmv(in: DataFrame): DataFrame = in
      .withColumn("hv", conv(substring(md5(concat(col("event_type"),
        lit(":"), col("event_id").cast("string"))), 1, 7), 16, 10)
        .cast("long"))
      .groupBy("event_type")
      .agg(org.apache.spark.sql.graft.KmvAgg
        .kmvMinhashes(col("hv"), col("event_id"), 64).as("sk"))
    def go(sink: String): Seq[String] = {
      val replay = graft.streaming.FileReplay.stage(rows,
        graft.streaming.FileReplay.rangeChunks(rows, col("event_id"), 4))
      val cp = Files.createTempDirectory("graft_cp_rocks_kmv").toString
      val q = kmv(replay.stream).writeStream.format("memory")
        .queryName(sink).outputMode("complete")
        .option("checkpointLocation", cp).start()
      try {
        replay.feedAll(q)
        val out = sorted(spark.table(sink)
          .select(col("event_type"), explode(col("sk"))))
        spark.catalog.dropTempView(sink)
        out
      } finally { q.stop(); replay.close() }
    }
    val heap = withProvider(None)(go("rocks_kmv_heap"))
    assert(heap.nonEmpty)
    assert(withProvider(Some(rocksDb))(go("rocks_kmv")) == heap)
  }

  test("TopKAgg state through RocksDB equals the heap-backed provider, with and without a restart") {
    val heap = withProvider(None)(run("rocks_ref_heap", interrupted = false))
    assert(heap.nonEmpty)
    val rocks = withProvider(Some(rocksDb)) {
      val clean = run("rocks_clean", interrupted = false)
      val recovered = run("rocks_recovered", interrupted = true)
      (clean, recovered)
    }
    assert(rocks._1 == heap,
      "RocksDB provider changed the aggregate's result vs heap-backed")
    assert(rocks._2 == heap,
      "RocksDB checkpoint restart changed the aggregate's result")
  }
}
