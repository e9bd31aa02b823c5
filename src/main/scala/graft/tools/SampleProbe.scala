package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Component timing for the v_neighbor_sample shape: distinct edge
  * build, hop-1 pruned window, hop-2 window vs hop-2 native top-k
  * aggregate (2k part groups) over the SAME cached edge set.
  *
  *   runMain graft.tools.SampleProbe <sfDir> [reps]
  */
object SampleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SampleProbe <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = build.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-14s min=${times.map(_._1).min}%.3f s  rows=${times.head._2}")
    }
    val eRaw = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey")
      .join(spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_partkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
    time("distinct")(eRaw.distinct())
    time("repart+dist")(eRaw.repartition(col("c"), col("p")).distinct())
    val eC = eRaw.repartition(col("c"), col("p")).distinct().cache()
    eC.count()
    time("h1-window") {
      val w = Window.partitionBy("c").orderBy(
        md5(concat(lit("h1:"), col("c").cast("string"), lit(":"),
          col("p").cast("string"))), col("p"))
      eC.filter(substring(md5(col("c").cast("string")), 1, 1) === "0")
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    }
    time("h2-window") {
      val w = Window.partitionBy("p").orderBy(
        md5(concat(lit("h2:"), col("p").cast("string"), lit(":"),
          col("c").cast("string"))), col("c"))
      eC.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    }
    time("h2-topk") {
      val h2rank = conv(substring(md5(concat(lit("h2:"),
        col("p").cast("string"), lit(":"), col("c").cast("string"))),
        1, 13), 16, 10).cast("long")
      eC.select(col("p"), col("c"), (-h2rank.cast("double")).as("nv"))
        .groupBy("p")
        .agg(org.apache.spark.sql.graft.TopKAgg
          .topkEntries(col("nv"), col("c"), 3).as("tk"))
        .select(col("p"), explode(col("tk")))
    }
    spark.stop()
  }
}
