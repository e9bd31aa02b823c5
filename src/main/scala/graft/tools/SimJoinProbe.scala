package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off branch prober for the dispatched similarity join: times the
  * PPJoin and count-join branches on an arbitrary documents fixture so
  * the density dispatch threshold is a measured number, not a guess
  * (docs/SCALE_CURVES.md). Usage:
  *   runMain graft.tools.SimJoinProbe <dir> <shingleSize> <threshold>
  */
object SimJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val t = args(2).toDouble
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
    }
    time("ppjoin") {
      graft.operators.TextOps
        .similarityJoin(docs, "doc_id", "lang", "text", n, t,
          denseVocabAvgDf = Double.MaxValue).count()
    }
    graft.operators.TextOps.releasePriorCaches()
    time("countjoin") {
      graft.operators.TextOps
        .similarityJoin(docs, "doc_id", "lang", "text", n, t,
          denseVocabAvgDf = 0.0).count()
    }
    spark.stop()
  }
}
