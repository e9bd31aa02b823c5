package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed ranking building blocks. */
object Ranks {

  /** The offsets-broadcast plumbing [[bucketedRank]] and
    * [[bucketedPrefixSum]] share (round-13 review: the two carried
    * hand-maintained copies of the same equivalence-critical scaffolding
    * — ironic, since the file exists because round 9 found exactly that):
    * aggregate `perBucket` per (partCols, bktCol) as `__s`, cumulative
    * window over buckets only as `__off` (RAW — NULL until some prior
    * bucket aggregated non-null; callers coalesce where 0 is correct),
    * and the null-safe (<=>) broadcast join back so rows with a NULL
    * partition key or bucket value keep the window semantics this helper
    * is pinned against (a plain equi-join would silently drop them —
    * round-9 advice). Null buckets rank as the lowest bucket, matching
    * the offsets window's nulls-first order. The joined frame carries
    * `__s` and `__off` for the caller's final expression; the caller
    * drops them.
    */
  private def joinBucketOffsets(df: DataFrame, partCols: Seq[String],
      bktCol: String, perBucket: Column): DataFrame = {
    val wOff = (if (partCols.isEmpty) Window.orderBy(bktCol)
                else Window.partitionBy(partCols.map(col): _*).orderBy(bktCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = df.groupBy((partCols :+ bktCol).map(col): _*)
      .agg(perBucket.as("__s"))
      .withColumn("__off", sum("__s").over(wOff))
    val keyCols = partCols :+ bktCol
    val off = offsets.select(
      keyCols.map(c => col(c).as(s"__k_$c")) ++
        Seq(col("__s"), col("__off")): _*)
    val cond = keyCols.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    df.join(broadcast(off), cond)
      .drop(keyCols.map(c => s"__k_$c"): _*)
  }

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
    * A bucket past 2^31-1 rows REFUSES instead of silently wrapping:
    * Spark's row_number is a 32-bit counter, so a too-coarse bktCol
    * (e.g. timestamp high bits over a narrow range) would emit
    * negative/duplicate ranks with no error (round-13 review) — in the
    * helper whose whole point is corpus scale.
    *
    * @param partCols  window partition keys (empty = one global ranking)
    * @param bktCol    order-consistent bucket column, already on `df`
    * @param orderCols total order within (partCols, bktCol)
    * @param rnCol     name of the produced rank column (1-based, dense
    *                  across buckets because offsets count every row)
    */
  def bucketedRank(df: DataFrame, partCols: Seq[String], bktCol: String,
      orderCols: Seq[Column], rnCol: String): DataFrame = {
    val wIn = Window.partitionBy((partCols :+ bktCol).map(col): _*)
      .orderBy(orderCols: _*)
    joinBucketOffsets(df, partCols, bktCol, count(lit(1)))
      .withColumn(rnCol,
        when(col("__s") > lit(Int.MaxValue.toLong), raise_error(concat(
          lit("bucketedRank: a bucket holds "), col("__s"),
          lit(" rows - row_number is a 32-bit counter; pick a finer bktCol"))))
        .otherwise(coalesce(col("__off"), lit(0L)) + row_number().over(wIn)))
      .drop("__s", "__off")
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
    *
    * NULL semantics match the window sum exactly (round-13 review: the
    * old `__off + within` rendering returned NULL for a row whose
    * within-bucket prefix was all-NULL even when earlier buckets held
    * values — the oracle returns their running total): NULL only when
    * NOTHING non-null precedes, otherwise the sum of whatever does.
    */
  def bucketedPrefixSum(df: DataFrame, partCols: Seq[String], bktCol: String,
      valCol: String, orderCols: Seq[Column], sumCol: String): DataFrame = {
    val wIn = Window.partitionBy((partCols :+ bktCol).map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = sum(valCol).over(wIn)
    joinBucketOffsets(df, partCols, bktCol, sum(valCol))
      .withColumn(sumCol,
        when(col("__off").isNull && within.isNull, lit(null))
          .otherwise(coalesce(col("__off"), lit(0L)) +
            coalesce(within, lit(0L))))
      .drop("__s", "__off")
  }
}
