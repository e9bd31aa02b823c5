package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** Bloom-filter semi join building blocks (q_bloom_semi): the sketch is
  * built by a distributed aggregate, the probe is a scan-side filter —
  * no join, no shuffle, no false negatives, false positives bounded by
  * the sizing.
  */
class BloomSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bloom probe: no false negatives, bounded fp rate, scan-only plan") {
    import spark.implicits._
    val members = (0L until 1000L).map(_ * 7L)
    val sketch = members.toDF("k")
      .select(GraftFunctions.bloom_agg(col("k"), 10000L, 131072L).as("bf"))
      .head().getAs[Array[Byte]](0)

    val probe = (0L until 70000L).toDF("x")
    val passed = probe.filter(GraftFunctions.bloom_might_contain(sketch, col("x")))

    // the probe must stay a pure scan filter: the whole point is that the
    // big side is never shuffled or joined
    val p = passed.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"probe is not scan-only:\n$p")

    val got = passed.collect().map(_.getLong(0)).toSet
    assert(members.forall(got.contains), "bloom produced a false negative")
    val fps = got.size - members.size
    assert(fps <= (0.02 * 70000).toInt, s"false-positive count too high: $fps")
  }
}
