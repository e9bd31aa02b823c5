package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Print the formatted physical plan of one or more board queries —
  * the iterate-until-it's-the-plan-you-want loop from the build notes.
  * Usage: runMain graft.tools.ExplainQ <name> [name...] [-sf <dir>]
  */
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val sf = args.sliding(2).collectFirst { case Array("-sf", d) => d }
      .getOrElse("/root/testdata/sf0.001")
    val names = args.indexOf("-sf") match {
      case -1 => args.toSeq
      case i => args.toSeq.patch(i, Nil, 2)
    }
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"==== $n ====")
      println(graft.SparkEntry.queries(n)(spark, sf).queryExecution
        .explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
