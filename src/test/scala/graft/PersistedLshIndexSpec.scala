package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted-index deployment posture, proven at the PLAN level: at
  * 100 TB the banded-LSH signature table is written ONCE as a bucketed
  * table (the daily dedup job's index), and candidate generation over it
  * must be EXCHANGE-FREE — the bucketed scan's HashPartitioning(band, bh)
  * already satisfies LshSelfJoinExec's clustered-distribution
  * requirement, so the only remaining cost is the per-partition sort of
  * bucket runs. This spec pins (a) zero shuffle exchanges in the
  * bucketed candidate plan and (b) pair-set equality with the
  * shuffle-path derivation.
  */
class PersistedLshIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed signature table yields exchange-free candidate generation") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val banded = graft.operators.TextOps
      .bandedSignatures(docs, "doc_id", "text", 3, 8, 4)
    val name = "lsh_index_bucketed_t"
    banded.write.mode("overwrite")
      .bucketBy(8, "band", "bh")
      .sortBy("band", "bh", "doc_id")
      .saveAsTable(name)
    try {
      val fromIndex = org.apache.spark.sql.graft.LshSelfJoin
        .candidatePairs(spark.table(name), "doc_id", "band", "bh")
        .distinct()
      // unwrap AQE to the executed plan and assert NO shuffle anywhere
      // below the distinct's own exchange — walk the plan string of the
      // candidate stage only (before .distinct) for precision
      val candOnly = org.apache.spark.sql.graft.LshSelfJoin
        .candidatePairs(spark.table(name), "doc_id", "band", "bh")
      val p = candOnly.queryExecution.executedPlan.toString()
      assert(p.contains("LshSelfJoin"),
        s"native operator must plan over the bucketed table:\n$p")
      assert(p.contains("Bucketed: true"),
        s"the scan must read the bucketed layout, not raw files:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed HashPartitioning(band, bh) must satisfy the operator's " +
          s"distribution — candidate generation pays ZERO shuffle:\n$p")
      // parity with the shuffle-path derivation on the same corpus
      val direct = graft.operators.TextOps
        .lshCandidatePairs(docs, "doc_id", "text", 3, 8, 4)
      val a = fromIndex.collect().map(_.toString).sorted.toSeq
      val b = direct.collect().map(_.toString).sorted.toSeq
      assert(a == b)
      assert(a.nonEmpty)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }
}
