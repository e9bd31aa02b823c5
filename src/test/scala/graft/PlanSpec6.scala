package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the fifth-continuation rows: lakehouse-ops audits stay
  * aggregate-only, the alerting folds stay window/agg-bounded, the
  * sketch set-ops never touch a data-scale window, and the Theil-Sen
  * pair join stays an equi-join on the bounded hourly table.
  */
class PlanSpec6 extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  private def exchanges(p: String): Int = raw"\(\d+\) Exchange".r.findAllIn(p).size

  test("q_zone_map: one agg shuffle onto zone keys — no join, no window") {
    val p = plan("q_zone_map")
    assert(!p.contains("Join"), s"zone-map audit must not join:\n$p")
    assert(!p.contains("Window"), s"zone-map audit needs no window:\n$p")
    assert(exchanges(p) <= 1, s"only the zone agg shuffles:\n$p")
  }

  test("q_compact_bins: date agg + manifest-scale prefix sum, no join") {
    val p = plan("q_compact_bins")
    assert(!p.contains("Join"), s"bin packing must not join:\n$p")
    // one shuffle to the date agg, one single-partition exchange for the
    // manifest window — metadata-scale by design (one row per file)
    assert(exchanges(p) <= 2, s"exchanges grew past agg+manifest-window:\n$p")
  }

  test("st_flapping: one per-key window pass + one aggregate, no join") {
    val p = plan("st_flapping")
    assert(!p.contains("Join"), s"flap detection must not join:\n$p")
    assert(exchanges(p) <= 1,
      s"lag window and per-key agg share the user_id partitioning:\n$p")
  }

  test("st_debounce: per-key collect + fold — no window at all, no join") {
    val p = plan("st_debounce")
    assert(!p.contains("Join"), s"debounce must not join:\n$p")
    assert(!p.contains("Window"),
      s"the cooldown fold rides aggregate(), not a window:\n$p")
    assert(exchanges(p) <= 1, s"one user_id agg shuffle only:\n$p")
  }

  test("v_degree_dist: degree agg + histogram-scale window, no cross product") {
    val p = plan("v_degree_dist")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"edge derivation degenerated:\n$p")
  }

  test("ts_kalman and ts_theil_sen: hourly pre-agg bounds everything") {
    val pk = plan("ts_kalman")
    assert(!pk.contains("Join") && !pk.contains("Window"),
      s"kalman fold is agg-only:\n$pk")
    val pt = plan("ts_theil_sen")
    assert(!pt.contains("CartesianProduct") && !pt.contains("BroadcastNestedLoopJoin"),
      s"pair enumeration must stay an equi-join on event_type:\n$pt")
  }

  test("q_approx_setops: sketch windows only — no data-scale global sort") {
    val p = plan("q_approx_setops")
    // the per-set and union row_number windows run over distinct-user
    // sets truncated to k=128; no global Sort outside a window, and the
    // only joins are the sketch merge + 1-row exact-count cross joins
    assert(!p.contains("GlobalLimit 0"), s"degenerate plan:\n$p")
    assert(p.contains("Window"), s"sketch rank must be a window:\n$p")
  }

  test("q_tpch3: date filters pushed to scans, top-10 is TakeOrdered") {
    val p = plan("q_tpch3")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must not be a global sort:\n$p")
    assert(raw"PushedFilters: \[[^\]]*o_orderdate".r.findFirstIn(p).isDefined,
      s"orders date filter must reach the parquet scan:\n$p")
    assert(raw"PushedFilters: \[[^\]]*l_shipdate".r.findFirstIn(p).isDefined,
      s"lineitem date filter must reach the parquet scan:\n$p")
    assert(!p.contains("CartesianProduct"), s"join degenerated:\n$p")
  }

  test("q_tpch5: dims broadcast, no cartesian, one fact-side agg") {
    val p = plan("q_tpch5")
    assert(p.contains("BroadcastHashJoin"), s"dim chain should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"co-location predicate degenerated the join:\n$p")
  }

  test("mm_mp3_probe: pure scan-side synth+walk — zero exchanges, no join") {
    val p = plan("mm_mp3_probe")
    assert(!p.contains("Join"), s"probe path must not join:\n$p")
    assert(exchanges(p) == 0, s"mm_mp3_probe is embarrassingly parallel:\n$p")
  }
}
