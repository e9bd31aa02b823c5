package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the fourth-continuation rows: the Scaladoc scale claims
  * (agg-only shapes, bounded exchanges, never-cross-product wedge joins,
  * scan-only codec projections) stay honest against plan regressions.
  */
class PlanSpec5 extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  private def exchanges(p: String): Int = raw"\(\d+\) Exchange".r.findAllIn(p).size

  test("v_lpa: equi-joins only, argmax via agg — no window, no cross product") {
    val p = plan("v_lpa")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LPA join degenerated:\n$p")
    assert(!p.contains("Window"), s"LPA argmax must ride the struct-min agg:\n$p")
  }

  test("v_link_pred: wedge equi-join + anti-join + broadcast degrees, top-k not a global sort") {
    val p = plan("v_link_pred")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"wedge join degenerated:\n$p")
    assert(p.contains("LeftAnti"), s"existing-edge removal must be an anti-join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"degree lookup should broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-50 must be TakeOrdered:\n$p")
  }

  test("tx_winnow: one doc-partition pass — no join, bounded exchanges") {
    val p = plan("tx_winnow")
    assert(!p.contains("Join"), s"winnowing is per-doc, no join:\n$p")
    // 2 exchanges for the selection itself; the tracked-cache boundary
    // (selection shared with dd_winnow_pairs) hides the doc_id
    // partitioning from the stats agg, which re-shuffles the already
    // winnowed (≈2/(w+1)-density) rows — bounded, and the cache buys a
    // whole shared derivation
    assert(exchanges(p) <= 3, s"selection+stats exchanges grew:\n$p")
  }

  test("tx_url_canon: row-local canonicalization, one canonical-key aggregate") {
    val p = plan("tx_url_canon")
    assert(!p.contains("Join"), s"canonicalization must not join:\n$p")
    assert(exchanges(p) <= 2, s"only the canonical-key agg (+distinct) shuffles:\n$p")
  }

  test("mm_gif: pure scan-side codec projection — zero exchanges, no join") {
    val p = plan("mm_gif")
    assert(!p.contains("Join"), s"codec path must not join:\n$p")
    assert(exchanges(p) == 0, s"mm_gif is embarrassingly parallel:\n$p")
  }

  test("ts_holt: two bounded aggregates, no join, no window") {
    val p = plan("ts_holt")
    assert(!p.contains("Join"), s"holt must not join:\n$p")
    assert(!p.contains("Window"), s"the fold rides aggregate(), not a window:\n$p")
    assert(exchanges(p) <= 2, s"hourly agg + per-type fold only:\n$p")
  }

  test("q_bitmap_distinct: map-side-combinable word aggs, no cross product") {
    val p = plan("q_bitmap_distinct")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"5-row join degenerated:\n$p")
    assert(p.contains("partial_bit_or") || p.contains("bit_or"),
      s"word build must be an aggregate:\n$p")
  }
}

/** Pins for the graph/keyword batch that followed. */
class PlanSpec5b extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("v_hits: equi-joins + partial aggs only, no cross product, no window") {
    val p = plan("v_hits")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"HITS join degenerated:\n$p")
    assert(!p.contains("Window"), s"HITS is aggregate-only:\n$p")
  }

  test("v_modularity: no cross product beyond the 1-row m broadcast") {
    val p = plan("v_modularity")
    assert(!p.contains("CartesianProduct"), s"modularity must broadcast m:\n$p")
    assert(!p.contains("Window"), s"audit is joins+aggs:\n$p")
  }

  test("tx_keyword_rake: one per-doc window; word stats never a cross join") {
    val p = plan("tx_keyword_rake")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"rake join degenerated:\n$p")
  }
}

/** Pins for the OLS/animation batch. */
class PlanSpec5c extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  private def exchanges(p: String): Int = raw"\(\d+\) Exchange".r.findAllIn(p).size

  test("q_ols: single global aggregate — one exchange, no join, no window") {
    val p = plan("q_ols")
    assert(!p.contains("Join") && !p.contains("Window"), s"OLS is one moment pass:\n$p")
    assert(exchanges(p) == 1, s"only the final 1-row agg shuffles:\n$p")
  }

  test("mm_gif_anim: partition-local codec — zero exchanges, no join") {
    val p = plan("mm_gif_anim")
    assert(!p.contains("Join"), s"codec path must not join:\n$p")
    assert(exchanges(p) == 0, s"mm_gif_anim is embarrassingly parallel:\n$p")
  }
}

/** Pins for the winnow-pairs/KMV batch. */
class PlanSpec5d extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("dd_winnow_pairs: fingerprint join is an equi-join, never a cross product") {
    val p = plan("dd_winnow_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"fingerprint join degenerated:\n$p")
  }

  test("q_approx_kmv: distinct + per-type window, no cross product") {
    val p = plan("q_approx_kmv")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"kmv join degenerated:\n$p")
    assert(p.contains("WindowGroupLimit") || p.contains("Window"),
      s"order statistic should ride a window:\n$p")
  }
}

/** Pins for the SAX/apportionment batch. */
class PlanSpec5e extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("ts_sax: no join; windows all ride the (type, wid) partitioning") {
    val p = plan("ts_sax")
    assert(!p.contains("Join"), s"SAX is per-series, no join:\n$p")
  }

  test("q_apportion: strata aggregate + broadcast totals, no cross product blowup") {
    val p = plan("q_apportion")
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastExchange"),
      s"totals must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"nothing here should sort-merge:\n$p")
  }
}

/** Pin for the spatial join. */
class PlanSpec5f extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("j_geo_bucket: cell equi-join, never a distance cross product") {
    val p = SparkEntry.queries("j_geo_bucket")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"spatial join degenerated:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"density cap should push a group limit below the sort:\n$p")
  }
}

/** Pins for the encoding-stats/TIFF batch. */
class PlanSpec5g extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("q_encoding_stats: one window pass, no join") {
    val p = plan("q_encoding_stats")
    assert(!p.contains("Join"), s"encoding stats must not join:\n$p")
  }

  test("mm_tiff: partition-local codec — zero exchanges, no join") {
    val p = plan("mm_tiff")
    assert(!p.contains("Join"), s"codec path must not join:\n$p")
    assert(!raw"\(\d+\) Exchange".r.findFirstIn(p).isDefined,
      s"mm_tiff is embarrassingly parallel:\n$p")
  }
}
