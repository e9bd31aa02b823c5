package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Fixture-table access (TESTDATA.md). One parquet file per table. */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts normalization — the fixture generator has shipped it as
    * TIMESTAMP(NANOS) (read as long under nanosAsLong, converted here) and
    * as TIMESTAMP(MICROS) without timezone (read as TIMESTAMP_NTZ, cast to
    * session-TZ timestamp — identical instants since every session pins
    * UTC). Dispatch on the read type so either vintage of testdata loads
    * to the same TimestampType column. Oracle queries must emit
    * epoch_ms/strftime rather than raw ns timestamps so both sides agree
    * on precision.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", expr("cast(ts as timestamp)"))
      case _ => df
    }
    else df
  }
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
