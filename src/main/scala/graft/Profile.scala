package graft
import org.apache.spark.sql.SparkSession

/** Dev-loop profiler: run named `SparkEntry.queries` against a sf dir with
  * per-query wall time and (optionally) the formatted physical plan.
  *
  * Usage: runMain graft.Profile <sfDir> [explain] <query...>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("explain")
    val names = args.drop(1).filterNot(_ == "explain")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"PROFILE $name rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
