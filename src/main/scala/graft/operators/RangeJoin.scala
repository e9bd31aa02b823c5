package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded/time-range joins (SURVEY.md §2.11 custom-operator class).
  *
  * A naive range join `a.ts <= b.ts <= a.ts + gap` degenerates to a
  * per-key cross product. Binning both sides to gap-sized buckets turns
  * it into an equi-join on (key, bucket): the left side claims bucket and
  * bucket+1, so every qualifying pair co-locates in exactly one shuffle
  * partition, then the exact predicate filters within it. Cost is
  * O(pairs-within-2-buckets), not O(pairs-per-key).
  */
object RangeJoin {

  /** Pairs (l, r) with the same key and `r.tsMillis` in
    * `[l.tsMillis, l.tsMillis + maxGapMillis]`. Input frames need the key
    * column `keyCol` and a millis timestamp column `tsCol`; output
    * prefixes columns with `l_`/`r_`.
    */
  def timeWindowJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, maxGapMillis: Long): DataFrame = {
    val l = left.columns.foldLeft(left)((df, c) => df.withColumnRenamed(c, s"l_$c"))
    val r = right.columns.foldLeft(right)((df, c) => df.withColumnRenamed(c, s"r_$c"))
    val lb = l.withColumn("__bktl",
      explode(array(
        (col(s"l_$tsCol") / maxGapMillis).cast("long"),
        (col(s"l_$tsCol") / maxGapMillis).cast("long") + 1)))
    val rb = r.withColumn("__bktr", (col(s"r_$tsCol") / maxGapMillis).cast("long"))
    lb.join(rb,
      col(s"l_$keyCol") === col(s"r_$keyCol") && col("__bktl") === col("__bktr") &&
        col(s"r_$tsCol") >= col(s"l_$tsCol") &&
        col(s"r_$tsCol") <= col(s"l_$tsCol") + maxGapMillis)
      .drop("__bktl", "__bktr")
  }
}
