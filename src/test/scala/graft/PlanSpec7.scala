package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-9 rows: the XML-compiled path fuses into one
  * scan-side projection chain (zero exchanges), the FLAC roundtrip is a
  * scan-only mapPartitions, the logistic training step is two bounded
  * aggregation passes with broadcast weights (no data-scale join or
  * window), and the converted gate rows stay free of data-scale
  * cartesians.
  */
class PlanSpec7 extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  private def exchanges(p: String): Int = raw"\(\d+\) Exchange".r.findAllIn(p).size

  test("op_path_xml: filter->math->editor->store fuses scan-side, zero exchanges") {
    val p = plan("op_path_xml")
    assert(!p.contains("Join"), s"a compiled path must not join:\n$p")
    assert(!p.contains("Window"), s"a compiled path needs no window:\n$p")
    assert(exchanges(p) == 0,
      s"the whole path is row-local projection/filter — nothing may shuffle:\n$p")
  }

  test("mm_flac: scan-only mapPartitions, zero exchanges before the scan") {
    val p = plan("mm_flac")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"the codec roundtrip is row-local:\n$p")
    assert(exchanges(p) == 0, s"codec work must not shuffle:\n$p")
  }

  test("tx_quality_train: two agg passes + broadcast weights, no data-scale join") {
    val p = plan("tx_quality_train")
    // weights flow back through broadcast nested-loop (1-row frames) —
    // fine; what must NOT appear is a shuffled data-scale join or window
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no data-scale shuffle join in a gradient step:\n$p")
    assert(!p.contains("Window"), s"gradients are aggregates, not windows:\n$p")
    // one partial-agg exchange per gradient pass (+ single-partition
    // finals): the scan is the cost, the shuffles carry one row each
    assert(exchanges(p) <= 6, s"aggregation exchanges grew:\n$p")
  }

  test("ann_ivf gate: broadcasts only — no shuffled join against the corpus") {
    val p = plan("ann_ivf")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"gate verification must ride broadcast joins:\n$p")
  }

  test("q_approx_distinct merge-invariance gate: two agg chains, broadcast combine") {
    val p = plan("q_approx_distinct")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"3-row gate combine must broadcast:\n$p")
    assert(!p.contains("Window"), s"no window in an HLL agg:\n$p")
  }
}
