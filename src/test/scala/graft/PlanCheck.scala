import org.apache.spark.sql.execution.ExplainMode

/** Debug utility: print the join/exchange/pushdown skeleton of named
  * board rows' physical plans (`sbt "Test/runMain PlanCheck q_tpch9"`) —
  * the quick iteration loop behind the PlanSpec* pins.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args) {
      val p = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      println(s"===== $n =====")
      println(p.linesIterator.filter(l => l.contains("Join") ||
        l.contains("Exchange") || l.contains("PushedFilters") ||
        l.contains("TakeOrdered") || l.contains("Cartesian") ||
        l.contains("Scan parquet")).mkString("\n"))
    }
    spark.stop()
  }
}
