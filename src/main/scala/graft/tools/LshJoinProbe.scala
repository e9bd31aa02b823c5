package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Before/after probe for the native LSH self-join operator (round-10):
  * times the candidate-pair derivation (pairs + distinct + count) over a
  * PRE-CACHED banded signature table, so the measurement isolates the
  * join-vs-native difference rather than shingle/minhash derivation.
  *
  *   runMain graft.tools.LshJoinProbe <sfDir> [reps]
  */
object LshJoinProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LshJoinProbe <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val banded = graft.operators.TextOps
      .bandedSignatures(docs, "doc_id", "text", 3, 8, 4)
    banded.count() // materialize the tracked cache once, outside timing

    def time(label: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = build.count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, n)
      }
      println(f"$label%-10s min=${times.map(_._1).min}%.3f s  " +
        f"pairs=${times.head._2}")
    }
    time("join") {
      val l = banded.as("l"); val r = banded.as("r")
      l.join(r, col("l.band") === col("r.band") &&
          col("l.bh") === col("r.bh") &&
          col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
        .distinct()
    }
    time("native") {
      org.apache.spark.sql.graft.LshSelfJoin
        .candidatePairs(banded, "doc_id", "band", "bh").distinct()
    }
    spark.stop()
  }
}
