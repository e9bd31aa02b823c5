package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's task/trigger plane (SURVEY.md §1.1 Task/TaskSet, §3.3)
  * as a rules-against-state dataflow: a small rules table (id, guard
  * expression over the rtvals snapshot columns, command) is evaluated
  * whenever state changes; guards that flip to true emit their command —
  * the Spark shape of `req`/`check` guard evaluation
  * (`/root/reference/src/util/task/Task.java:150-199`,
  * `CheckBlock.java:49-71`).
  *
  * Interval/time-of-day scheduling stays outside the engine (the
  * reference's scheduler -> cron/Trigger.ProcessingTime on the stream).
  */
final case class TaskRule(ruleId: String, guardSql: String, command: String)

final case class FiredCommand(ruleId: String, key: String, command: String, ts: Long)

object RuleEngine {

  implicit private val firedEnc: Encoder[FiredCommand] = Encoders.product[FiredCommand]

  /** Evaluate every rule's guard against a rtvals snapshot frame (the
    * output of RtVals.snapshots, batch or per-micro-batch via
    * foreachBatch). Guards are SQL booleans over the snapshot columns
    * (key, last, min, max, count, avg, stddev, lastTs). Returns the
    * commands whose guard holds, per key.
    */
  def evaluate(snapshot: DataFrame, rules: Seq[TaskRule]): Dataset[FiredCommand] = {
    val spark = snapshot.sparkSession
    import spark.implicits._
    rules.map { r =>
      snapshot.filter(expr(r.guardSql))
        .select(
          lit(r.ruleId).as("ruleId"),
          col("key"),
          lit(r.command).as("command"),
          col("lastTs").as("ts"))
    }.reduceOption(_ unionAll _)
      .getOrElse(spark.emptyDataset[FiredCommand].toDF())
      .as[FiredCommand]
  }

  /** Streaming runner: per micro-batch, evaluate rules against the batch's
    * snapshot updates and hand fired commands to `dispatch` (send to a
    * stream, email, system command — the OUTPUT plane of Task.java:69-71).
    *
    * Alerts are inherently low-volume when rules are sane, but one
    * misconfigured match-everything guard over a full stream would ship
    * the whole batch to the driver — so the per-batch collect is bounded
    * at `maxAlertsPerBatch` and the overflow is counted, not collected.
    */
  def run(
      snapshots: Dataset[ValSnapshot],
      rules: Seq[TaskRule],
      maxAlertsPerBatch: Int = 10000,
      onDropped: (Long, Long) => Unit = (batchId, n) =>
        System.err.println(s"graft.RuleEngine: batch $batchId dropped $n alerts over cap"))(
      dispatch: Seq[FiredCommand] => Unit) =
    snapshots.writeStream.foreachBatch { (batch: Dataset[ValSnapshot], batchId: Long) =>
      val fired = evaluate(batch.toDF(), rules)
      val taken = fired.limit(maxAlertsPerBatch + 1).collect().toSeq
      if (taken.length > maxAlertsPerBatch) {
        // count the real overflow (one extra row only proved it exists)
        val totalOver = fired.count() - maxAlertsPerBatch
        onDropped(batchId, totalOver)
      }
      dispatch(taken.take(maxAlertsPerBatch))
    }
}
