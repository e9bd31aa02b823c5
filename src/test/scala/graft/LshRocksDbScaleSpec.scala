package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 verdict task 7: a SECOND keyed-state workload on the RocksDB
  * state-store provider, at a scale where bounded executor heap is the
  * point. The streaming LSH near-dup index (dd_stream_lsh_parity's
  * flatMapGroupsWithState bucket state) replays a 10x corpus — 50k docs,
  * density-preserved via the ScaleFixture word-shuffle, NOT naive row
  * copies — under RocksDB, and the emitted candidate-pair set must equal
  * the batch LshSelfJoin's exactly (chunking-invariant by construction).
  * The spec also records the provider-reported state size and replay
  * throughput via `info()` — the "recorded state-size/throughput note".
  */
class LshRocksDbScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val providerConf = "spark.sql.streaming.stateStore.providerClass"
  private val rocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** `scale`x of the sf0.1 documents corpus, in-memory: copy k>0 rewrites
    * the text with the seeded word shuffle (token stats preserved,
    * shingles differ — per-row near-dup density stays at the corpus
    * rate). Default 10x in-suite; SPARK_GRAFT_LSH_SCALE=100 is the
    * round-13 streaming-state-decade run (numbers recorded in
    * docs/SCALE_CURVES.md) — too heavy for every suite run.
    */
  private val scale = sys.env.getOrElse("SPARK_GRAFT_LSH_SCALE", "10").toInt

  private def docsScaled: DataFrame = {
    val src = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val copies = spark.range(scale).select(col("id").cast("int").as("k"))
    src.crossJoin(broadcast(copies))
      .select(
        (col("doc_id") + col("k").cast("long") * 1000000000L).as("doc_id"),
        when(col("k") === 0, col("text"))
          .otherwise(graft.tools.ScaleFixture.shuffleWordsExpr(col("text"),
            xxhash64(col("doc_id"), col("k")))).as("text"))
  }

  test(s"streaming LSH bucket state through RocksDB: ${scale}x parity + state note") {
    val prev = spark.conf.getOption(providerConf)
    spark.conf.set(providerConf, rocksDb)
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // materialize once: the streaming staging and the batch twin must
      // see the identical corpus, and the shuffle UDF must run once
      val corpus = docsScaled.cache()
      val nDocs = corpus.count()
      assert(nDocs == 5000L * scale, s"expected ${scale}x corpus, got $nDocs")
      // same scale-aware exchange width the board's replay rows use
      spark.conf.set("spark.sql.shuffle.partitions", graft.streaming
        .FileReplay.replayPartitions(nDocs * 4).toString)
      val replay = graft.streaming.FileReplay.stage(corpus,
        graft.streaming.FileReplay.rangeChunks(corpus, col("doc_id"), 4))
      val sink = "lsh_rocks_scale_sink"
      val t0 = System.nanoTime()
      val q = graft.streaming.Sketches
        .streamingLshCandidates(replay.stream, "doc_id", "text",
          shingleSize = 3, k = 8, bands = 4, maxBucket = 1 << 20)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      val progress = try {
        replay.feedAll(q)
        q.lastProgress
      } finally { q.stop(); replay.close() }
      val sec = (System.nanoTime() - t0) / 1e9

      val streamPairs = spark.table(sink)
        .select(col("docA").as("doc_a"), col("docB").as("doc_b")).distinct()
      val batchPairs = graft.operators.TextOps.lshCandidatePairs(
        corpus, "doc_id", "text", shingleSize = 3, k = 8, bands = 4)
      val diff = streamPairs.withColumn("src", lit("s"))
        .join(batchPairs.withColumn("dst", lit("b")),
          Seq("doc_a", "doc_b"), "full_outer")
        .agg(
          sum(when(col("dst").isNull, 1L).otherwise(0L)),
          sum(when(col("src").isNull, 1L).otherwise(0L)),
          count(lit(1)))
        .head()
      assert(diff.getLong(0) == 0L, s"stream-only pairs: ${diff.getLong(0)}")
      assert(diff.getLong(1) == 0L, s"batch-only pairs: ${diff.getLong(1)}")
      assert(diff.getLong(2) > 0L, "vacuous: no candidate pairs at 10x")

      // provider-reported keyed-state footprint + replay throughput —
      // the recorded note the verdict asks for
      val st = Option(progress).toSeq
        .flatMap(p => p.stateOperators.toSeq)
      val stateRows = st.map(_.numRowsTotal).sum
      val stateMem = st.map(_.memoryUsedBytes).sum
      info(f"RocksDB LSH state: $stateRows state rows (buckets), " +
        f"${stateMem / 1024.0 / 1024.0}%.1f MB provider-reported, " +
        f"$nDocs docs in $sec%.1f s = ${nDocs / sec}%.0f docs/s, " +
        f"pairs=${diff.getLong(2)}")
      assert(stateRows > 0L, "state operator reported no keyed state")
      spark.catalog.dropTempView(sink)
      corpus.unpersist()
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      prev match {
        case Some(v) => spark.conf.set(providerConf, v)
        case None => spark.conf.unset(providerConf)
      }
    }
  }
}
