package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level prober for the v_knn_graph board row: times the knnGraph
  * kernel alone, then the mutual-edge join, so a regression localizes to
  * a stage instead of a query total. Usage: runMain graft.tools.KnnProbe <dir>
  */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    time("knnGraph")(graft.operators.VectorOps.knnGraph(e, 5).count())
    val knn = graft.operators.VectorOps.knnGraph(e, 5)
    time("mutual_join_uncached") {
      knn.as("x").join(knn.as("y"),
        col("x.qid") === col("y.nid") && col("x.nid") === col("y.qid") &&
          col("x.qid") < col("x.nid")).count()
    }
    spark.stop()
  }
}
