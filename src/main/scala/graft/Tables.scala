package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table access (TESTDATA.md). One parquet file per table. */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}

/** One verifiable query: a Spark build plus (optionally) the equivalent
  * DuckDB SQL oracle. Queries without an oracle get a weaker rows-only
  * check from the driver (documented per query).
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, Some(oracle))

  def noOracle(name: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(name, build, None)
}
