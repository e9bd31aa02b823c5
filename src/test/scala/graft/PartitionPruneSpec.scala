package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hive-style partitioned layout — the first-order scan reducer at
  * 100 TB: a lang='de' filter over a lang-partitioned corpus must prune
  * to the one directory at PLANNING time (PartitionFilters on the scan,
  * not a post-scan Filter), and dynamic partition overwrite must replace
  * only the partition it writes. Pinned here because no oracle row can
  * see a directory layout.
  */
class PartitionPruneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("partitioned write + partition-pruned read + dynamic overwrite") {
    val out = Files.createTempDirectory("graft_part").toString
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)

    // layout: one directory per lang value
    val langs = docs.select("lang").distinct().collect().map(_.getString(0)).sorted
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).map(_.drop(5)).sorted
    assert(dirs.toSeq == langs.toSeq, s"partition dirs $dirs != langs $langs")

    // pruned read: the lang predicate must be a PartitionFilter on the
    // scan — planning-time directory pruning, not a row filter
    val filtered = spark.read.parquet(out).filter(col("lang") === "de")
    val plan = filtered.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters") &&
      raw"PartitionFilters: \[[^\]]*lang[^\]]*\]".r.findFirstIn(plan).isDefined,
      s"lang filter not pushed to partition pruning:\n$plan")
    val expected = docs.filter(col("lang") === "de").count()
    assert(filtered.count() == expected)

    // dynamic partition overwrite: rewriting ONE lang must leave others
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      docs.filter(col("lang") === "de")
        .withColumn("text", lit("rewritten"))
        .write.mode("overwrite").partitionBy("lang").parquet(out)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val after = spark.read.parquet(out)
    assert(after.filter(col("lang") === "de")
      .filter(col("text") === "rewritten").count() == expected,
      "overwritten partition must carry the new rows")
    assert(after.filter(col("lang") =!= "de").count() ==
      docs.filter(col("lang") =!= "de").count(),
      "dynamic overwrite must not touch sibling partitions")
  }
}
