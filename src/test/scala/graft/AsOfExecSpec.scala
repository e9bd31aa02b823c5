package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AsOf, AsOfJoinExec}

/** The native as-of join operator (logical AsOfJoinPlan -> planner
  * AsOfJoinStrategy -> physical AsOfJoinExec): semantics against a
  * hand-built truth table, parity against the union+window rendering
  * on the real fixture, and the physical-plan shape (one merge exec,
  * co-partitioned sorted children, no candidate-pair join anywhere).
  */
class AsOfExecSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // AQE wraps the plan in AdaptiveSparkPlanExec whose children are not
  // traversed by collect — unwrap to the current inner plan first
  private def execOf(df: org.apache.spark.sql.DataFrame): Seq[AsOfJoinExec] = {
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case other => other
    }
    p.collect { case e: AsOfJoinExec => e }
  }

  test("as-of semantics: latest at-or-before, ties to largest id, nulls when none") {
    // left: (key, time, id)   right: (key, time, id, payload)
    val left = Seq(
      (1L, 100L, 10L), // two right rows at-or-before; later one wins
      (1L, 50L, 11L),  // exactly-at right row matches (<=, not <)
      (1L, 5L, 12L),   // nothing at-or-before -> nulls
      (2L, 100L, 13L), // key isolation: key 1 candidates must not leak
      (3L, 100L, 14L), // tie on right time -> largest right id wins
      (4L, 100L, 15L)  // key with no right rows at all -> nulls
    ).toDF("k", "t", "id")
    val right = Seq(
      (1L, 50L, 20L, "a"), (1L, 80L, 21L, "b"), (1L, 120L, 22L, "late"),
      (2L, 99L, 23L, "c"),
      (3L, 90L, 24L, "tie1"), (3L, 90L, 25L, "tie2")
    ).toDF("rk", "rt", "rid", "payload")

    val out = AsOf.joinAsOf(left, right, "k", "rk", "t", "rt", "id", "rid")
    assert(execOf(out).nonEmpty, "expected AsOfJoinExec in the physical plan:\n" +
      out.queryExecution.executedPlan)
    val got = out.select("id", "rid", "payload").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        Option(r.getString(2)).getOrElse(""))).toSet
    assert(got == Set(
      (10L, 21L, "b"),   // t=100: right 80 beats 50; 120 excluded
      (11L, 20L, "a"),   // t=50 matches rt=50 inclusively
      (12L, -1L, ""),    // t=5: none at-or-before
      (13L, 23L, "c"),
      (14L, 25L, "tie2"),// rt tie at 90 -> larger rid
      (15L, -1L, "")))
  }

  test("null keys/times never match and never block other keys; INT keys widen") {
    // Null key/time rows sort FIRST under the exec's required ordering
    // (Ascending = nulls first); before the round-9 fix they unboxed to 0L
    // and either falsely matched key-0 left rows or halted the merge for
    // negative keys. Cover: null left key, null left time, null right key,
    // null right time, a real key 0, and a negative key AFTER the nulls.
    val left = Seq(
      (null.asInstanceOf[java.lang.Long], jl(100L), jl(1L)), // null key -> nulls
      (jl(0L), null.asInstanceOf[java.lang.Long], jl(2L)),   // null time -> nulls
      (jl(0L), jl(100L), jl(3L)),   // key 0 must match ONLY real key-0 rows
      (jl(-5L), jl(100L), jl(4L)),  // negative key: must still reach its match
      (jl(7L), jl(100L), jl(5L))
    ).toDF("k", "t", "id")
    val right = Seq(
      (null.asInstanceOf[java.lang.Long], jl(10L), jl(20L), "nullkey"),
      (jl(0L), null.asInstanceOf[java.lang.Long], jl(21L), "nulltime"),
      (jl(0L), jl(50L), jl(22L), "zero"),
      (jl(-5L), jl(90L), jl(23L), "neg"),
      (jl(7L), jl(80L), jl(24L), "seven")
    ).toDF("rk", "rt", "rid", "payload")
    val out = AsOf.joinAsOf(left, right, "k", "rk", "t", "rt", "id", "rid")
    assert(execOf(out).nonEmpty)
    val got = out.select("id", "payload").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)).getOrElse(""))).toSet
    assert(got == Set(
      (1L, ""), (2L, ""), (3L, "zero"), (4L, "neg"), (5L, "seven")))

    // INT key/time must widen to long, not ClassCastException at execute
    val li = Seq((1, 100, 1L)).toDF("k", "t", "id")
    val ri = Seq((1, 50, 10L, "x")).toDF("rk", "rt", "rid", "payload")
    val outI = AsOf.joinAsOf(li, ri, "k", "rk", "t", "rt", "id", "rid")
    assert(outI.select("payload").collect().map(_.getString(0)).toSeq == Seq("x"))

    // non-integral key is a clear argument error, not a stage failure
    val ls = Seq(("a", 1L, 1L)).toDF("k", "t", "id")
    val rs = Seq(("a", 1L, 2L, "x")).toDF("rk", "rt", "rid", "payload")
    intercept[IllegalArgumentException] {
      AsOf.joinAsOf(ls, rs, "k", "rk", "t", "rt", "id", "rid")
    }
  }

  test("self-join (same DataFrame both sides) resolves without exprId collision") {
    val ev = spark.range(0, 100).select(
      (col("id") % 5).as("k"), (col("id") * 3 % 97).as("t"), col("id").as("id"))
    // both sides ARE the same analyzed plan — identical exprIds on every
    // column unless joinAsOf re-aliases the right side (round-8 advice);
    // select-with-.as would mint fresh ids and mask the bug
    val out = AsOf.joinAsOf(ev, ev, "k", "k", "t", "t", "id", "id")
    val ids = out.queryExecution.analyzed.output.map(_.exprId)
    assert(ids.distinct.size == ids.size,
      s"duplicate exprIds in as-of self-join output: $ids")
    // names collide by construction; rebind positionally to inspect sides
    val named = out.toDF("k", "t", "id", "rk", "rt", "rid")
    // every left row has itself at-or-before -> zero null matches
    assert(named.filter(col("rid").isNull).count() == 0)
    assert(named.count() == 100)
  }

  private def jl(v: Long): java.lang.Long = java.lang.Long.valueOf(v)

  test("parity with the union+window as-of rendering on the events fixture") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    // union + last(ignore nulls) window: the j_asof board rendering
    // (ts ties: errors sort BEFORE purchases — the oracle's inclusive
    // `p.ts >= e.ts`; kept in sync with StateQueries.j_asof)
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"),
        when(col("event_type") === "error", 0).otherwise(1),
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val expected = ev.filter(col("event_type").isin("purchase", "error"))
      .withColumn("err_id", when(col("event_type") === "error", col("event_id")))
      .withColumn("last_err", last("err_id", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("last_err").as("err_event_id"))

    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("tus"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("r_event_id"), col("user_id").as("r_user_id"),
        unix_micros(col("ts")).as("r_tus"))
    val native = AsOf.joinAsOf(purchases, errors,
        "user_id", "r_user_id", "tus", "r_tus", "event_id", "r_event_id")
      .select(col("event_id"), col("r_event_id").as("err_event_id"))

    assert(execOf(native).nonEmpty)
    assert(native.count() == expected.count())
    assert(native.exceptAll(expected).isEmpty && expected.exceptAll(native).isEmpty,
      "native as-of disagrees with the window rendering")
    // sanity: the fixture exercises both the match and no-match paths
    assert(native.filter(col("err_event_id").isNull).count() > 0)
    assert(native.filter(col("err_event_id").isNotNull).count() > 0)
  }

  test("ts-tie semantics agree across window, exec and streaming formulations") {
    // round-11 streaming review finding: DuckDB's ASOF `p.ts >= e.ts` is
    // INCLUSIVE, so a dim row sharing a query's exact ts must match
    // regardless of how the ids compare — the window rendering and the
    // stream machine previously ordered by plain (ts, id), making a
    // same-ts dim's visibility depend on the id comparison. All three
    // formulations now pin the exec's rule: at-or-before, ties to the
    // largest (time, id).
    val frame = Seq(
      // (user, type, ts, id)
      (1L, "error", 100L, 9L), (1L, "purchase", 100L, 5L), // inclusive, dim id larger
      (1L, "purchase", 99L, 1L),                           // strictly before any dim
      (2L, "error", 100L, 3L), (2L, "error", 100L, 7L),    // equal-ts dims: largest id
      (2L, "purchase", 100L, 5L),
      (3L, "error", 100L, 2L), (3L, "purchase", 100L, 8L)  // inclusive, dim id smaller
    )
    val expected = Set((5L, 9L), (1L, -1L), (5L, 7L), (8L, 2L))
    val ev = frame.toDF("user_id", "event_type", "ts", "event_id")

    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"),
        when(col("event_type") === "error", 0).otherwise(1),
        col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val window = ev
      .withColumn("err_id", when(col("event_type") === "error", col("event_id")))
      .withColumn("last_err", last("err_id", ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("last_err"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(window == expected, s"window rendering: $window")

    val native = AsOf.joinAsOf(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "error")
          .select(col("event_id").as("r_event_id"),
            col("user_id").as("r_user_id"), col("ts").as("r_ts")),
        "user_id", "r_user_id", "ts", "r_ts", "event_id", "r_event_id")
      .select(col("event_id"), col("r_event_id"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(native == expected, s"native exec: $native")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.EnrichEvent]
    ms.addData(frame.map { case (u, k, t, i) =>
      graft.streaming.EnrichEvent(u.toString, if (k == "error") "dim" else "qry", t, i)
    })
    val sink = "asof_tie_stream_t"
    val q = graft.streaming.Cep.asOfEnrich(ms.toDS(), "dim", "qry").toDF()
      .writeStream.format("memory").queryName(sink).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(sink)
      .select(col("queryId"), col("matchId"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.dropTempView(sink)
    assert(streamed == expected, s"stream machine: $streamed")
  }

  test("plan shape: sorted co-partitioned children, merge only — no join node") {
    val l = spark.range(0, 1000).select(
      (col("id") % 7).as("k"), (col("id") * 13 % 997).as("t"), col("id").as("id"))
    val r = spark.range(0, 2000).select(
      (col("id") % 7).as("rk"), (col("id") * 29 % 991).as("rt"), col("id").as("rid"))
    val out = AsOf.joinAsOf(l, r, "k", "rk", "t", "rt", "id", "rid")
    val plan = out.queryExecution.executedPlan.toString
    assert(execOf(out).nonEmpty)
    // EnsureRequirements must have satisfied distribution+ordering below the exec
    assert(plan.contains("Sort "), s"children must be sorted:\n$plan")
    assert(plan.contains("hashpartitioning"), s"children must be hash-partitioned:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")
      && !plan.contains("CartesianProduct"), s"no generic join may appear:\n$plan")
    // and the merge agrees with a driver-side brute force
    val rRows = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val brute = l.collect().map { x =>
      val (k, t, id) = (x.getLong(0), x.getLong(1), x.getLong(2))
      val m = rRows.filter(p => p._1 == k && p._2 <= t)
        .sortBy(p => (p._2, p._3)).lastOption
      (id, m.map(_._3).getOrElse(-1L))
    }.toSet
    val got = out.select("id", "rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    assert(got == brute)
  }
}
