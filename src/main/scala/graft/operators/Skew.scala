package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (builder-prompt scale checklist).
  * AQE's skew-join handling covers sort-merge joins; explicit salting is
  * the fallback when a dimension join hot-spots on a handful of keys.
  */
object Skew {

  /** Join types the salt/replicate scheme preserves: the LARGE side is
    * never replicated, so large-preserving types are safe; a right/full
    * outer join would emit an unmatched SMALL row once per salt replica
    * — saltFactor duplicates the plain join doesn't have.
    */
  private val safeTypes = Set("inner", "left", "leftouter", "leftsemi", "leftanti")

  /** Salted equi-join: the large (skewed) side gets a deterministic salt
    * in [0, saltFactor); the small side is replicated saltFactor times so
    * every (key, salt) pair finds its match. Result rows equal the plain
    * join — only the shuffle distribution changes.
    *
    * The salt hashes the large side's ROW CONTENT, never
    * monotonically_increasing_id or rand: those are partition-order
    * dependent, so a task retry after a fetch failure would recompute
    * DIFFERENT salts for rows whose earlier output was already fetched —
    * the classic nondeterministic-expression-before-shuffle hazard that
    * loses or duplicates join rows on partial stage recomputation.
    * Identical duplicate rows share a salt (they cannot be told apart by
    * any deterministic function); distribution comes from column variety,
    * which skewed FACT rows have.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(safeTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports large-side-preserving join types only; " +
        s"'$joinType' would emit unmatched small-side rows once per " +
        "salt replica")
    // hash only hashable columns: xxhash64 rejects MapType at analysis
    // time, so a large frame carrying a properties/tags map column
    // would fail outright if every column were hashed blindly
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val saltCols = large.schema.fields
      .filter(f => hashable(f.dataType)).map(f => col(f.name)).toSeq
    require(saltCols.nonEmpty,
      "saltedJoin: no hashable columns to derive a deterministic salt from")
    val salted = large.withColumn("__salt",
      pmod(xxhash64(saltCols: _*), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
