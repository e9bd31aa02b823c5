package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ranking building blocks. */
object Ranks {

  /** Global (or per-partition-key) `row_number` WITHOUT a data-scale
    * single-partition window — the two-level rank: rows bucket by an
    * ORDER-CONSISTENT coarse key (high bits of the leading sort column:
    * b1 < b2 must imply every row of b1 sorts before every row of b2),
    * per-bucket counts make a metadata-scale offsets table whose
    * cumulative window runs over buckets only, the offsets broadcast
    * back, and each (partition, bucket) sorts independently:
    * `rn = offset(bucket) + row_number within bucket`.
    *
    * Extracted from pl_epoch_shuffle / tx_quality_auc (round-9 review:
    * two hand-maintained copies of the same equivalence argument). The
    * naive rendering — row_number over the partition keys alone — holds
    * only as many window partitions as there are keys, which at corpus
    * scale is one unbounded straggler sort per key (measured 31× at 10×
    * data with 12 keys).
    *
    * @param partCols  window partition keys (empty = one global ranking)
    * @param bktCol    order-consistent bucket column, already on `df`
    * @param orderCols total order within (partCols, bktCol)
    * @param rnCol     name of the produced rank column (1-based, dense
    *                  across buckets because offsets count every row)
    */
  def bucketedRank(df: DataFrame, partCols: Seq[String], bktCol: String,
      orderCols: Seq[Column], rnCol: String): DataFrame = {
    val wOff = (if (partCols.isEmpty) Window.orderBy(bktCol)
                else Window.partitionBy(partCols.map(col): _*).orderBy(bktCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.groupBy((partCols :+ bktCol).map(col): _*).count()
      .withColumn("__off", coalesce(sum("count").over(wOff), lit(0L)))
      .drop("count")
    val wIn = Window.partitionBy((partCols :+ bktCol).map(col): _*)
      .orderBy(orderCols: _*)
    // null-safe (<=>) join so rows with a NULL partition key or NULL
    // bucket value keep the row_number-window semantics this helper is
    // pinned against (window partitioning groups nulls; a plain equi-join
    // would silently drop them — round-9 advice). Null buckets rank as
    // the lowest bucket, matching the offsets window's nulls-first order.
    val keyCols = partCols :+ bktCol
    val off = offsets.select(
      keyCols.map(c => col(c).as(s"__k_$c")) :+ col("__off"): _*)
    val cond = keyCols.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    df.join(broadcast(off), cond)
      .withColumn(rnCol, col("__off") + row_number().over(wIn))
      .drop(("__off" +: keyCols.map(c => s"__k_$c")): _*)
  }

  /** Per-key INCLUSIVE running sum of `valCol` without a data-scale
    * single-partition window — [[bucketedRank]]'s prefix-sum twin, and
    * exactly equal to
    * `sum(valCol) OVER (PARTITION BY partCols ORDER BY orderCols ROWS
    * UNBOUNDED PRECEDING)` when `bktCol` is order-consistent: rows
    * bucket by the coarse key, per-bucket sums make a metadata-scale
    * offsets table whose cumulative window runs over buckets only, the
    * offsets broadcast back, and each (partition, bucket) runs its own
    * running sum. The naive rendering holds only as many window
    * partitions as there are keys — for a ~5-value lang key that is
    * one unbounded straggler sort per language at corpus scale (the
    * same measured pattern bucketedRank was extracted for).
    */
  def bucketedPrefixSum(df: DataFrame, partCols: Seq[String], bktCol: String,
      valCol: String, orderCols: Seq[Column], sumCol: String): DataFrame = {
    val wOff = (if (partCols.isEmpty) Window.orderBy(bktCol)
                else Window.partitionBy(partCols.map(col): _*).orderBy(bktCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.groupBy((partCols :+ bktCol).map(col): _*)
      .agg(sum(valCol).as("__s"))
      .withColumn("__off", coalesce(sum("__s").over(wOff), lit(0L)))
      .drop("__s")
    val wIn = Window.partitionBy((partCols :+ bktCol).map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keyCols = partCols :+ bktCol
    val off = offsets.select(
      keyCols.map(c => col(c).as(s"__k_$c")) :+ col("__off"): _*)
    val cond = keyCols.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    df.join(broadcast(off), cond)
      .withColumn(sumCol, col("__off") + sum(valCol).over(wIn))
      .drop(("__off" +: keyCols.map(c => s"__k_$c")): _*)
  }
}
