package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** File-backed micro-batch replay for the streaming parity rows.
  *
  * The round-9 harness fed every parity row by collecting the corpus to
  * the driver and replaying it through a `MemoryStream` — the one
  * driver-memory-bounded seam in an otherwise distributed board. This
  * helper removes it: the corpus is written into per-chunk parquet files
  * by a normal DISTRIBUTED write (`partitionBy` on the chunk column — the
  * rows never pass through the driver), and a running
  * `readStream.parquet` query is fed one chunk per micro-batch by
  * atomically renaming that chunk's single part file into the watched
  * directory. Because `repartition(chunkCol)` routes each chunk value to
  * exactly one shuffle partition, every chunk directory holds exactly ONE
  * part file, so a publish is a single atomic rename and the engine can
  * never observe half a chunk — batch boundaries stay exact, which the
  * watermark/session parity oracles replay in SQL.
  *
  * At 100 TB this is the real deployment shape: a backfill lands files in
  * object storage and Structured Streaming consumes them; only the
  * orchestration (which chunk is visible) touches the driver.
  */
object FileReplay {

  /** Stage `df` into per-chunk files. `chunkCol` must be a deterministic
    * non-null integer expression; chunks replay in ascending order.
    */
  def stage(df: DataFrame, chunkCol: Column): Handle = {
    val root = Files.createTempDirectory("graft_replay")
    val stageDir = root.resolve("stage")
    val watchDir = root.resolve("watch")
    Files.createDirectories(watchDir)
    val spark = df.sparkSession
    df.withColumn("__chunk", chunkCol)
      // one shuffle partition per chunk value -> one part file per chunk
      // directory -> atomic single-rename publish
      .repartition(col("__chunk"))
      .write.partitionBy("__chunk")
      .parquet(stageDir.toString)
    val chunkDirs = Files.list(stageDir).iterator()
    var chunks = Map.empty[Int, Path]
    while (chunkDirs.hasNext) {
      val d = chunkDirs.next()
      val n = d.getFileName.toString
      if (n.startsWith("__chunk="))
        chunks += (n.stripPrefix("__chunk=").toInt -> d)
    }
    new Handle(spark, df.drop("__chunk").schema, root, watchDir, chunks)
  }

  final class Handle private[FileReplay] (
      spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      root: Path,
      watchDir: Path,
      chunks: Map[Int, Path]) {

    /** Ascending chunk ids present in the staged data (a range-chunking
      * expression can legitimately produce an empty chunk).
      */
    def chunkIds: Seq[Int] = chunks.keys.toSeq.sorted

    /** The streaming view of the watched directory. */
    def stream: DataFrame =
      spark.readStream.schema(schema).parquet(watchDir.toString)

    /** Make chunk `i`'s file visible to the stream (atomic rename; no-op
      * for an empty chunk). Does NOT drain the query — the caller decides
      * when a micro-batch boundary falls (two-source rows publish both
      * sides first).
      */
    def publish(i: Int): Unit = chunks.get(i).foreach { dir =>
      val files = Files.list(dir).iterator()
      while (files.hasNext) {
        val f = files.next()
        val name = f.getFileName.toString
        if (name.endsWith(".parquet"))
          Files.move(f, watchDir.resolve(s"chunk$i-$name"),
            StandardCopyOption.ATOMIC_MOVE)
      }
    }

    /** Publish chunk `i` and drain the query to its batch boundary. */
    def feed(q: StreamingQuery, i: Int): Unit = {
      publish(i); q.processAllAvailable()
    }

    /** Replay every staged chunk in ascending order. */
    def feedAll(q: StreamingQuery): Unit = chunkIds.foreach(feed(q, _))

    /** Batch view of everything PUBLISHED so far (for gate rows that
      * compare the stream's output against exact statistics of the
      * replayed corpus). Publishing moves a chunk's file into the watch
      * directory, so after `feedAll` this is the whole staged corpus.
      */
    def staged: DataFrame =
      spark.read.schema(schema).parquet(watchDir.toString)

    def close(): Unit = {
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p)) {
          val it = Files.list(p).iterator()
          while (it.hasNext) rm(it.next())
        }
        Files.deleteIfExists(p)
      }
      rm(root)
    }
  }

  /** Range-chunking expression: splits `c`'s value domain [lo, hi] into
    * `n` equal-width ascending chunks — the id/time-ordered replay shape
    * every parity row uses. `lo`/`hi` are scalar aggregates (two longs to
    * the driver, not the corpus).
    */
  def rangeChunks(df: DataFrame, c: Column, n: Int): Column = {
    val r = df.agg(min(c).cast("long"), max(c).cast("long")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    val width = (hi - lo + 1 + n - 1) / n max 1L
    ((c.cast("long") - lit(lo)) / lit(width)).cast("int")
  }
}
