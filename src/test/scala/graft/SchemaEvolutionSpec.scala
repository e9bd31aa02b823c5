package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Long-lived archives evolve: a sensor firmware update adds a column
  * mid-deployment and the collector keeps appending to the same
  * directory. The engine must read the union schema (old files null the
  * new column) and prune/push down against it — this pins the
  * mergeSchema behavior the rolling file sinks rely on.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("mergeSchema reads the union of evolved parquet parts") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "temp")
      .write.parquet(s"$dir/part=old")
    Seq((3L, 30.0, 99.0), (4L, 40.0, 98.0)).toDF("id", "temp", "salinity")
      .write.parquet(s"$dir/part=new")

    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(df.columns.sorted.toSeq == Seq("id", "part", "salinity", "temp"))

    val rows = df.orderBy("id")
      .select(col("id"), col("temp"), col("salinity"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows.toSeq == Seq(
      (1L, 10.0, None), (2L, 20.0, None),
      (3L, 30.0, Some(99.0)), (4L, 40.0, Some(98.0))))

    // pushdown still reaches the scan against the merged schema
    val p = df.filter(col("temp") > 25).select("id", "temp")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters: [IsNotNull(temp), GreaterThan(temp,25.0)]"),
      s"filter not pushed through merged schema:\n$p")
  }
}
