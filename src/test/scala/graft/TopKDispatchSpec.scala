package graft

import graft.operators.TopKDispatch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-10 verdict's task 2: regime dispatch must be CODE, not
  * scaladoc. Pins (a) the decision on both measured regimes of the
  * orders fact, (b) rendering equivalence — both renderings return the
  * identical row set, so a dispatch flip can never change answers —
  * and (c) the stats path when ANALYZE has populated distinctCount.
  */
class TopKDispatchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  private def orders = Tables.load(spark, sf, "orders")

  test("low-cardinality groups dispatch to the native aggregate") {
    val (_, d) = TopKDispatch.perGroupTopK(
      orders, Seq("o_orderstatus"), "o_totalprice", "o_orderkey", 3)
    assert(d.rendering == "native",
      s"3 status groups over the fact must be the bounded tree-reduce: $d")
    assert(d.groups <= d.threshold)
  }

  test("high-cardinality groups dispatch to the ranking window") {
    val (_, d) = TopKDispatch.perGroupTopK(
      orders, Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)
    assert(d.rendering == "window",
      s"~1 row/group/partition starves partial agg — window regime: $d")
    assert(d.groups > d.threshold)
  }

  test("both renderings return the identical row set (dispatch can never change answers)") {
    val n = TopKDispatch.renderNative(
      orders, Seq("o_orderstatus", "o_orderpriority"),
      "o_totalprice", "o_orderkey", 5)
    val w = TopKDispatch.renderWindow(
      orders, Seq("o_orderstatus", "o_orderpriority"),
      "o_totalprice", "o_orderkey", 5)
    assert(n.columns.toSeq == w.columns.toSeq, "schemas must match")
    val ns = n.collect().map(_.toString).sorted.toSeq
    val ws = w.collect().map(_.toString).sorted.toSeq
    assert(ns == ws)
    assert(ns.nonEmpty)
  }

  test("null values/ids and non-double/long columns are normalized identically") {
    // round-11 review finding: TopKAgg skips null value/id rows natively
    // while a raw window would rank them — both renderings must state
    // the same input contract or a regime flip could change answers
    import spark.implicits._
    val in = Seq[(String, java.lang.Integer, java.lang.Integer)](
      ("a", null, 1), ("a", 5, 2), ("a", 3, null), ("a", 4, 4),
      ("b", 9, null), ("b", null, null), ("b", 1, 7)
    ).toDF("g", "v", "id")
    val n = TopKDispatch.renderNative(in, Seq("g"), "v", "id", 3)
    val w = TopKDispatch.renderWindow(in, Seq("g"), "v", "id", 3)
    // names + types must match (the driver compare's key); nullability
    // legitimately differs (the aggregate's output is non-nullable by
    // construction, a window projection stays nullable)
    assert(n.schema.map(f => (f.name, f.dataType)) ==
      w.schema.map(f => (f.name, f.dataType)), s"${n.schema} vs ${w.schema}")
    val ns = n.collect().map(_.toString).sorted.toSeq
    assert(ns == w.collect().map(_.toString).sorted.toSeq)
    // null-bearing rows are excluded by BOTH renderings
    assert(ns.size == 3, s"expected (a,5),(a,4),(b,1) ranked: $ns")
  }

  test("filtered frames never use whole-table catalog stats") {
    val name = "topk_dispatch_filter_t"
    orders.select("o_orderstatus", "o_totalprice", "o_orderkey")
      .write.mode("overwrite").saveAsTable(name)
    try {
      spark.sql(
        s"ANALYZE TABLE $name COMPUTE STATISTICS FOR COLUMNS o_orderstatus")
      val d = TopKDispatch.decide(
        spark.table(name).filter(col("o_totalprice") > 999999),
        Seq("o_orderstatus"), 3)
      assert(d.source == "probe",
        s"a filter above the leaf invalidates whole-table stats: $d")
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("catalog column stats short-circuit the probe") {
    val name = "topk_dispatch_stats_t"
    orders.select("o_orderstatus", "o_totalprice", "o_orderkey")
      .write.mode("overwrite").saveAsTable(name)
    try {
      spark.sql(
        s"ANALYZE TABLE $name COMPUTE STATISTICS FOR COLUMNS o_orderstatus")
      val d = TopKDispatch.decide(spark.table(name), Seq("o_orderstatus"), 3)
      assert(d.source == "stats", s"ANALYZE'd table must use stats: $d")
      assert(d.rendering == "native")
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }
}
