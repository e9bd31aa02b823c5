package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Injection counter — a plain static shared by driver and executors
  * (local mode: one JVM), because accumulator updates from FAILED tasks
  * are discarded by design and could never witness the injected attempt.
  */
object RetryProbe {
  val fires = new AtomicInteger(0)
}

/** Round-10 verdict task 5: Spark recomputes partitions on task retry
  * and speculation, so every native operator must be
  * RE-EXECUTION-STABLE — a task that fails once and re-runs must yield
  * the identical result. The shared session runs local[4, 2]
  * (maxFailures=2), and each case wires a mapPartitions shim that
  * throws on attempt 0 of partition 0 and passes through on the retry;
  * the spec then pins result equality against the uninjected run and
  * asserts the injection actually fired.
  */
class RetryDeterminismSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  /** Pass-through that fails the FIRST attempt of partition 0 of its
    * stage. Safe under maxFailures=2: the retry (attemptNumber 1)
    * passes. Works upstream of an operator (map-stage retry re-reads
    * the source) and downstream of an aggregation (reduce-stage retry
    * re-fetches shuffle blocks and re-aggregates).
    */
  private def onceFailing(df: DataFrame): DataFrame = onceFailingAfter(df, 0)

  /** Like [[onceFailing]] but the failing attempt first yields `after`
    * rows — so a downstream WRITER has already opened files and emitted
    * real output when the task dies, and the commit protocol must
    * discard that partial attempt output (a creation-time throw would
    * leave nothing to discard and prove less).
    */
  private def onceFailingAfter(df: DataFrame, after: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        RetryProbe.fires.incrementAndGet()
        if (after <= 0)
          throw new RuntimeException("injected task failure (retry probe)")
        var yielded = 0
        it.map { r =>
          yielded += 1
          if (yielded > after)
            throw new RuntimeException("injected mid-write task failure (retry probe)")
          r
        }
      } else it
    }(enc)
  }

  private def sorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def withFireCheck(body: => Unit): Unit = {
    val before = RetryProbe.fires.get()
    body
    assert(RetryProbe.fires.get() > before,
      "the injected failure never fired — the case proved nothing")
  }

  test("LshSelfJoinExec result is identical when a task fails once and retries") {
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val clean = sorted(graft.operators.TextOps
      .lshCandidatePairs(docs, "doc_id", "text", 3, 8, 4))
    withFireCheck {
      val retried = sorted(graft.operators.TextOps
        .lshCandidatePairs(onceFailing(docs), "doc_id", "text", 3, 8, 4))
      assert(retried == clean)
      assert(clean.nonEmpty)
    }
  }

  test("TopKAgg over a shuffle: map-stage retry AND reduce-stage retry") {
    val orders = Tables.load(spark, sf, "orders")
      .select("o_orderstatus", "o_totalprice", "o_orderkey")
    def agg(in: DataFrame): DataFrame = in
      .groupBy("o_orderstatus")
      .agg(org.apache.spark.sql.graft.TopKAgg
        .topkEntries(col("o_totalprice"), col("o_orderkey"), 5).as("tk"))
      .select(col("o_orderstatus"), posexplode(col("tk")))
      .select(col("o_orderstatus"), col("pos"),
        col("col.id"), col("col.value"))
    val clean = sorted(agg(orders))
    assert(clean.nonEmpty)
    withFireCheck { // retry upstream of the partial aggregate
      assert(sorted(agg(onceFailing(orders))) == clean)
    }
    withFireCheck { // retry downstream: re-fetches shuffle, re-merges buffers
      assert(sorted(onceFailing(agg(orders))) == clean)
    }
  }

  test("AsOfJoinExec result is identical when a task fails once and retries") {
    val left = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("k"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("t"),
        col("o_orderkey").as("id"))
    val right = Tables.load(spark, sf, "orders")
      .select(col("o_custkey").as("rk"),
        (datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long") - 1L).as("rt"),
        col("o_orderkey").as("rid"), col("o_totalprice").as("payload"))
    val clean = sorted(org.apache.spark.sql.graft.AsOf
      .joinAsOf(left, right, "k", "rk", "t", "rt", "id", "rid"))
    assert(clean.nonEmpty)
    withFireCheck {
      val retried = sorted(org.apache.spark.sql.graft.AsOf
        .joinAsOf(onceFailing(left), right, "k", "rk", "t", "rt", "id", "rid"))
      assert(retried == clean)
    }
  }

  test("FileReplay staging write retries without duplicating or losing rows") {
    val rows = Tables.load(spark, sf, "events")
      .filter(col("value").isNotNull)
      .select("event_type", "value")
    val cleanCounts = sorted(rows.groupBy("event_type").count())
    withFireCheck {
      // the injected failure hits the staging WRITE job's first task
      // AFTER 50 rows have flowed — the attempt has a real partially
      // written file the parquet commit protocol must discard, so the
      // replayed stream still carries exactly-once rows
      val replay = graft.streaming.FileReplay.stage(onceFailingAfter(rows, 50),
        graft.streaming.FileReplay.rangeChunks(rows, col("value"), 3))
      val sink = "retry_replay_sink"
      val q = replay.stream
        .groupBy("event_type").count()
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete").start()
      try {
        replay.feedAll(q)
        assert(sorted(spark.table(sink)) == cleanCounts)
      } finally {
        q.stop()
        replay.close()
        spark.catalog.dropTempView(sink)
      }
    }
  }
}
