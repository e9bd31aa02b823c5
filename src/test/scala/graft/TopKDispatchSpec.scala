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

  test("duplicate (value,id) pairs, NaN and -0.0 normalize identically") {
    // round-11 second-pass review finding: TopKBuf has SET semantics on
    // (value, id), rejects NaN on insert and folds -0.0 to +0.0 — a raw
    // window does none of those, so the renderings disagreed on frames
    // with duplicate pairs (the window double-counts them and can push a
    // distinct pair out of the top-k), NaN values (Spark ranks NaN above
    // every double; TopKAgg drops the row) or negative zero. The
    // dispatcher's contract is now TopKAgg's semantics on BOTH sides.
    import spark.implicits._
    val in = Seq(
      // g=a: (5.0,2) duplicated — plain row_number would emit it twice
      // and evict (3.0,9) from the top-3
      ("a", 5.0, 2L), ("a", 5.0, 2L), ("a", 4.0, 4L), ("a", 3.0, 9L),
      // g=b: NaN must be dropped, not ranked first
      ("b", Double.NaN, 1L), ("b", 7.0, 2L), ("b", 6.0, 3L),
      // g=c: -0.0 and +0.0 with the SAME id collapse to one +0.0 entry;
      // with different ids they tie on value and break by id
      ("c", -0.0, 5L), ("c", 0.0, 5L), ("c", -0.0, 3L)
    ).toDF("g", "v", "id")
    val n = TopKDispatch.renderNative(in, Seq("g"), "v", "id", 3)
    val w = TopKDispatch.renderWindow(in, Seq("g"), "v", "id", 3)
    val ns = n.collect().map(_.toString).sorted.toSeq
    val ws = w.collect().map(_.toString).sorted.toSeq
    assert(ns == ws, s"native=$ns window=$ws")
    assert(ns == Seq(
      "[a,1,2,5.0]", "[a,2,4,4.0]", "[a,3,9,3.0]",
      "[b,1,2,7.0]", "[b,2,3,6.0]",
      "[c,1,3,0.0]", "[c,2,5,0.0]").sorted.toSeq)
  }

  test("the window rendering's set semantics cost no extra exchange") {
    // the adjacent-dedup lag and the post-filter row_number share the
    // window's (partition, order) spec, so Catalyst plans ONE shuffle
    // and ONE sort for the whole rendering — dedup via dropDuplicates
    // would add a second, differently-keyed exchange
    val w = TopKDispatch.renderWindow(
      orders, Seq("o_orderstatus"), "o_totalprice", "o_orderkey", 3)
    val plan = w.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    val sorts = "\\bSort\\b".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected one shuffle, got $exchanges:\n$plan")
    assert(sorts == 1, s"expected one sort, got $sorts:\n$plan")
  }

  test("frames with row-count-changing nodes never use catalog stats") {
    // the bare-scan guard is a WHITELIST (Project-over-leaf only): a
    // blacklist of Filter/Join/Aggregate waved through Limit (truncates
    // rows) and Generate/explode (multiplies rows), feeding whole-table
    // cardinalities to a frame with a different row count
    val name = "topk_dispatch_shape_t"
    orders.select("o_orderstatus", "o_totalprice", "o_orderkey")
      .write.mode("overwrite").saveAsTable(name)
    try {
      spark.sql(
        s"ANALYZE TABLE $name COMPUTE STATISTICS FOR COLUMNS o_orderstatus")
      val limited = TopKDispatch.decide(
        spark.table(name).limit(100), Seq("o_orderstatus"), 3)
      assert(limited.source == "probe",
        s"limit changes the row count — stats are invalid: $limited")
      assert(limited.rows == 100, s"probe must see the limited frame: $limited")
      val exploded = TopKDispatch.decide(
        spark.table(name).withColumn("x",
          explode(array(lit(1), lit(2), lit(3)))),
        Seq("o_orderstatus"), 3)
      assert(exploded.source == "probe",
        s"explode multiplies the row count — stats are invalid: $exploded")
      // a Project that REPLACES the group column under the same name
      // must not reuse the raw column's distinct count
      val aliased = TopKDispatch.decide(
        spark.table(name).withColumn("o_orderstatus",
          concat(col("o_orderstatus"), col("o_orderkey"))),
        Seq("o_orderstatus"), 3)
      assert(aliased.source == "probe",
        s"derived grouping key must not reuse raw-column stats: $aliased")
      // the whitelist and the catalog-leaf read must walk the SAME
      // (optimized, post-withCachedData) plan: a cached aggregate's
      // optimized plan is a bare InMemoryRelation leaf while its
      // ANALYZED plan still bottoms out at the relation — reading the
      // leaf off the analyzed plan handed whole-table stats to a
      // group-count-sized frame
      val agg = spark.table(name).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n")).cache()
      try {
        agg.count() // materialize so the InMemoryRelation substitutes
        val cached = TopKDispatch.decide(agg, Seq("o_orderstatus"), 3)
        assert(cached.source == "probe",
          s"a cached aggregate must not reuse base-table stats: $cached")
        assert(cached.rows == 3, s"probe must see the aggregated frame: $cached")
      } finally agg.unpersist()
      // a constant-folded frame (optimized to an empty LocalRelation)
      // has no catalog leaf either
      val folded = TopKDispatch.decide(
        spark.table(name).filter(lit(false)), Seq("o_orderstatus"), 3)
      assert(folded.source == "probe",
        s"a folded-empty frame must not report whole-table stats: $folded")
      assert(folded.rows == 0, s"probe must see the empty frame: $folded")
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
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

  // ---- round-11 task 6: model-count decisions + unified render ----

  test("decideFromCounts applies the same shuffled-mass boundary") {
    val parts = 32
    val t = math.max(1L, 15000L / (3L * parts))
    assert(TopKDispatch.decideFromCounts(15000, 3, 3, parts).rendering
      == "native")
    assert(TopKDispatch.decideFromCounts(15000, t, 3, parts).rendering
      == "native")
    assert(TopKDispatch.decideFromCounts(15000, t + 1, 3, parts).rendering
      == "window")
    assert(TopKDispatch.decideFromCounts(15000, 3, 3, parts).source
      == "model")
  }

  test("render() honors the decision; both picks return identical rows") {
    val dN = TopKDispatch.decideFromCounts(1000000, 3, 5, 32)
    val dW = TopKDispatch.decideFromCounts(10, 1000, 5, 32)
    assert(dN.rendering == "native" && dW.rendering == "window")
    val cols = (Seq("o_orderstatus"), "o_totalprice", "o_orderkey")
    val n = TopKDispatch.render(orders, cols._1, cols._2, cols._3, 5, dN)
    val w = TopKDispatch.render(orders, cols._1, cols._2, cols._3, 5, dW)
    assert(!n.queryExecution.executedPlan.toString.contains("Window"))
    assert(w.queryExecution.executedPlan.toString.contains("Window"))
    assert(n.collect().map(_.toString).sorted.toSeq ==
      w.collect().map(_.toString).sorted.toSeq)
  }

  test("globalTopK plans as TakeOrderedAndProject and guards the sort cliff") {
    val g = TopKDispatch.globalTopK(orders, 10,
      col("o_totalprice").desc, col("o_orderkey"))
    assert(g.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      g.queryExecution.executedPlan.toString.linesIterator.take(3).mkString)
    assert(g.count() == 10)
    // above topKSortFallbackThreshold the plan would silently become a
    // full global Sort — the entry point must refuse instead
    intercept[IllegalArgumentException] {
      TopKDispatch.globalTopK(orders, 20000, col("o_orderkey"))
    }
  }
}
