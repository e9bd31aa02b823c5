package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for Ranks.bucketedRank: the two-level distributed rank
  * must equal the naive single-window row_number on any input whose
  * bucket column is order-consistent with the leading sort key —
  * including duplicate sort keys, negative keys (negative buckets),
  * empty partitions-with-one-bucket, and the global (no partition key)
  * form. The helper backs pl_epoch_shuffle and tx_quality_auc.
  */
class RanksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("partitioned form equals the naive per-key window on skewed data") {
    // deterministic pseudo-random rows incl. duplicate hv and hot keys
    val rows = (0 until 5000).map { i =>
      val key = if (i % 3 == 0) "hot" else "k" + (i % 7)
      val hv = ((i * 2654435761L) % 10007) - 5003 // negative values too
      (key, hv, i.toLong)
    }
    val df = rows.toDF("k", "hv", "id").repartition(11)
      .withColumn("bkt", floor(col("hv") / 64.0).cast("long"))
    val got = graft.operators.Ranks
      .bucketedRank(df, Seq("k"), "bkt", Seq(col("hv"), col("id")), "rn")
      .select("k", "hv", "id", "rn")
    val naive = df.withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy(col("hv"), col("id"))))
      .select("k", "hv", "id", "rn")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "two-level rank diverged from the naive window")
  }

  test("global form (no partition keys) equals a single global row_number") {
    val df = (0 until 2000)
      .map(i => (((i * 48271L) % 997) - 498, i.toLong))
      .toDF("v", "id").repartition(5)
      .withColumn("bkt", floor(col("v") / 32.0).cast("long"))
    val got = graft.operators.Ranks
      .bucketedRank(df, Seq.empty, "bkt", Seq(col("v"), col("id")), "rn")
      .select("v", "id", "rn")
    val naive = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))))
      .select("v", "id", "rn")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("single-bucket and single-row degenerate cases") {
    val one = Seq(("a", 5L, 1L)).toDF("k", "v", "id")
      .withColumn("bkt", lit(0L))
    val r1 = graft.operators.Ranks
      .bucketedRank(one, Seq("k"), "bkt", Seq(col("v"), col("id")), "rn")
      .select("rn").as[Long].collect()
    assert(r1.toSeq == Seq(1L))
    val same = (1 to 100).map(i => ("a", 7L, i.toLong)).toDF("k", "v", "id")
      .withColumn("bkt", lit(0L)) // all rows one bucket, duplicate sort key
    val r2 = graft.operators.Ranks
      .bucketedRank(same, Seq("k"), "bkt", Seq(col("v"), col("id")), "rn")
      .select("rn").as[Long].collect().sorted
    assert(r2.toSeq == (1L to 100L))
  }

  test("null partition keys and null buckets rank like the window (not dropped)") {
    // round-9 advice: the offsets equi-join silently dropped NULL-keyed
    // rows that row_number windows would rank. Null-safe join keeps them;
    // null buckets sort first, matching the window's nulls-first order.
    val rows = Seq(
      (Some("a"), Some(1L), 10L, 1L), (Some("a"), Some(1L), 20L, 2L),
      (Some("a"), None, 5L, 3L), // null bucket in a live partition
      (None, Some(0L), 7L, 4L), (None, Some(0L), 9L, 5L), // null part key
      (None, None, 1L, 6L)) // both null
    val df = rows.toDF("k", "bkt", "v", "id")
    val got = graft.operators.Ranks
      .bucketedRank(df, Seq("k"), "bkt", Seq(col("v"), col("id")), "rn")
      .select("k", "v", "id", "rn")
    val naive = df.withColumn("rn", row_number().over(
        Window.partitionBy("k").orderBy(col("bkt").asc_nulls_first,
          col("v"), col("id"))))
      .select("k", "v", "id", "rn")
    assert(got.count() == rows.size, "null-keyed rows were dropped")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "null-key ranking diverged from the window semantics")
  }
}
