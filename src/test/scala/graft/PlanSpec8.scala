package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-10 TPC-H depth rows (verdict task 6): the
  * Q2-shape correlated-min join must decorrelate into broadcast joins
  * with a TakeOrdered top-k, and the Q8/Q9 multi-level aggregations must
  * keep every dim broadcast with the fact side shuffling only on the
  * group key. All filters must reach the parquet scans.
  */
class PlanSpec8 extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  private def exchanges(p: String): Int = raw"\(\d+\) Exchange".r.findAllIn(p).size

  test("q_tpch2: decorrelated min join broadcasts, filters pushed, TakeOrdered") {
    val p = plan("q_tpch2")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must not be a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dim/min sides should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"min-join equality degenerated:\n$p")
    assert(raw"PushedFilters: \[[^\]]*p_size".r.findFirstIn(p).isDefined &&
      raw"PushedFilters: \[[^\]]*EqualTo\(p_type,MEDIUM\)".r.findFirstIn(p).isDefined,
      s"part filters must reach the parquet scan:\n$p")
    assert(raw"PushedFilters: \[[^\]]*EqualTo\(r_name,EUROPE\)".r.findFirstIn(p).isDefined,
      s"region filter must reach the parquet scan:\n$p")
    // one shuffle for the min-per-part agg, one for the DISTINCT — never
    // a fact-scale sort or replicated join
    assert(exchanges(p) <= 2, s"exchanges grew past agg+distinct:\n$p")
  }

  test("q_tpch8: every dim broadcast, one fact-side shuffle onto the year key") {
    val p = plan("q_tpch8")
    assert(p.contains("BroadcastHashJoin"), s"dim chain should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"8-way join degenerated:\n$p")
    assert(raw"PushedFilters: \[[^\]]*EqualTo\(p_type,ECONOMY\)".r.findFirstIn(p).isDefined &&
      raw"PushedFilters: \[[^\]]*EqualTo\(r_name,AMERICA\)".r.findFirstIn(p).isDefined,
      s"part/region filters must reach the parquet scans:\n$p")
    assert(exchanges(p) <= 1, s"only the year groupBy may shuffle:\n$p")
  }

  test("q_tpch9: profit rollup keeps one fact scan and one group-key shuffle") {
    val p = plan("q_tpch9")
    assert(p.contains("BroadcastHashJoin"), s"dims should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"join degenerated:\n$p")
    assert(raw"PushedFilters: \[[^\]]*StringContains\(p_name,gear\)".r.findFirstIn(p).isDefined,
      s"part name filter must reach the parquet scan:\n$p")
    assert(raw"\(\d+\) Scan parquet".r.findAllIn(p).size == 5,
      s"exactly the 5 base tables scan once each:\n$p")
    assert(exchanges(p) <= 1, s"only the (nation, year) groupBy may shuffle:\n$p")
  }
}
