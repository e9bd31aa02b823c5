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

  test("parity with the union+window as-of rendering on the events fixture") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    // union + last(ignore nulls) window: the j_asof board rendering
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
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
