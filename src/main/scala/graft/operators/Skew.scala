package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (builder-prompt scale checklist).
  * AQE's skew-join handling covers sort-merge joins; explicit salting is
  * the fallback when a dimension join hot-spots on a handful of keys.
  */
object Skew {

  /** Salted equi-join: the large (skewed) side gets a deterministic salt
    * in [0, saltFactor); the small side is replicated saltFactor times so
    * every (key, salt) pair finds its match. Result rows equal the plain
    * join — only the shuffle distribution changes.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
