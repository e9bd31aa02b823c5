package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Verify <sfDir> <outDir> [queryName...]")
    val sfDir = args(0)
    val outDir = args(1)
    // optional query-name filter for fast single-query iteration
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // multi-process cluster mode (round-10 verdict task 1): the driver
    // contract stays local[N], but SPARK_GRAFT_MASTER can point the same
    // board at e.g. local-cluster[2,16,8192] so broadcast fetch, closure/
    // native-operator serialization and state-store serde cross a real
    // JVM boundary; SPARK_GRAFT_JARS ships the packaged library to the
    // executor processes (they don't share the driver's classpath).
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // mirror Bench's join-strategy tuning (guide §3.1/§9) so the plans
      // the driver verifies are the plans the bench times; results are
      // strategy-invariant, the mirror is for plan-evidence fidelity
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCAL_MAP_BYTES", "67108864"))
      .config("spark.sql.streaming.minBatchesToRetain", "2")
      // mirror Bench's replay-tier conf (see Bench.scala): no-data
      // micro-batches off so the oracle verifies the exact configuration
      // the bench times; st_stream_session_parity scope-restores true
      .config("spark.sql.streaming.noDataMicroBatches.enabled",
        sys.env.getOrElse("SPARK_GRAFT_STREAM_NODATA", "false"))
    sys.env.get("SPARK_GRAFT_JARS").foreach(j => b.config("spark.jars", j))
    sys.env.get("SPARK_GRAFT_EXECUTOR_MEM")
      .foreach(m => b.config("spark.executor.memory", m))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the full graft dialect (pow rewrite + native strategies) installs
    // at SESSION build: previously the pow rule arrived only as a side
    // effect of the first as-of/LSH join, making unrelated rows' doubles
    // depend on board execution order (round-13 review)
    org.apache.spark.sql.graft.GraftOptimizations.install(spark)
    new java.io.File(outDir).mkdirs()
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(only).toMap
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // release streaming memory-sink temp views (their rows live on the
      // driver until dropped; the parquet write above consumed them) and
      // the psink parquet dirs (fully consumed by the same write)
      try spark.catalog.listTables().collect()
        .filter(_.isTemporary).foreach(t => spark.catalog.dropTempView(t.name))
      catch { case _: Throwable => }
      graft.streaming.FileReplay.purgePsinks()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
