package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime skew-join mitigation — the complement to the
  * deterministic `Skew.saltedJoin`: when one join key carries 400x the
  * median partition, AQE must split the skewed partition at runtime
  * (OptimizeSkewedJoin marks the SMJ `skew=true`) instead of letting one
  * task straggle. This is the mechanism a 1000-executor job leans on
  * when the skew isn't known in advance; pinned here so a config or
  * planner change that silently disables it fails loudly.
  */
class SkewJoinAqeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0 carries 400k rows; 999 other keys carry 100 each
      val left = spark.range(0, 400000).select(lit(0L).as("k"), col("id").as("lv"))
        .union(spark.range(0, 99900).select((col("id") % 999 + 1).as("k"),
          col("id").as("lv")))
      val right = spark.range(0, 1000).select(col("id").as("k"),
        (col("id") * 7).as("rv"))
      // collect() runs THIS Dataset's QueryExecution — count() would spawn
      // a separate one whose final adaptive plan we couldn't inspect
      val joined = left.join(right, "k")
      assert(joined.collect().length == 499900)
      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join for splitting:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
