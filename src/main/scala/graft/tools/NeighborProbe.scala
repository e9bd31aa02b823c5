package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Component timing for the round-11 v_neighbor_sample rewrite (both
  * hops as dedup-free native top-k aggregates over the raw pair
  * stream). rank()/hopTopK() mirror the builders inside
  * Relational.v_neighbor_sample — keep them in sync when the query
  * changes, or the probe times a different plan.
  *
  *   runMain graft.tools.NeighborProbe <sfDir> [reps]
  */
object NeighborProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: NeighborProbe <sfDir> [reps]")
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // MUST match the cloned-session conf v_neighbor_sample sets
      // (Relational.scala: 65536 covers hop-2's ~20k part groups per map
      // partition) — at 4096 the probe's hop-2 would take the sort-based
      // fallback the real query never pays, timing the wrong plan.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(act: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = act
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = times.map(_._1).min
      println(f"[probe] $label%-28s min=$best%8.3f s  rows=${times.head._2}")
    }

    def raw = graft.Tables.load(spark, dir, "orders")
      .select("o_orderkey", "o_custkey")
      .join(graft.Tables.load(spark, dir, "lineitem")
        .select("l_orderkey", "l_partkey"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))

    time("raw fact join")(raw.count())
    val eC = raw.cache()
    eC.count()
    def rank(salt: String, a: org.apache.spark.sql.Column,
        b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      -conv(substring(md5(concat(lit(salt), a.cast("string"), lit(":"),
        b.cast("string"))), 1, 13), 16, 10).cast("long").cast("double")
    def hopTopK(df: DataFrame, src: String, dst: String, salt: String,
        f: Int): DataFrame =
      df.select(col(src), rank(salt, col(src), col(dst)).as("nv"), col(dst))
        .groupBy(src)
        .agg(org.apache.spark.sql.graft.TopKAgg
          .topkEntries(col("nv"), col(dst), f).as("tk"))
        .select(col(src), explode(col("tk")).as("e"))
        .select(col(src), col("e.id").as(dst))
    val h1 = hopTopK(
      eC.filter(substring(md5(col("c").cast("string")), 1, 1) === "0"),
      "c", "p", "h1:", 3)
    time("h1 topk (warm cache)")(h1.count())
    val h2 = hopTopK(eC, "p", "c", "h2:", 3)
      .select(col("p").as("p2"), col("c").as("hop2_cust"))
    time("h2 topk (warm cache)")(h2.count())
    time("full join (warm cache)")(h1.join(h2, col("p") === col("p2")).count())
    spark.stop()
  }
}
