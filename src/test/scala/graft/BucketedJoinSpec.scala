package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Co-located (bucketed) joins: pre-bucketing both fact tables on the
  * join key removes the per-query shuffle entirely — the strategy for
  * repeated fact-to-fact joins at 100 TB (write once bucketed, join
  * shuffle-free forever after).
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed-by-key tables join without an exchange") {
    val sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sf, "orders")
        .write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables.load(spark, sf, "lineitem")
        .write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          spark.table("lineitem_b")("l_orderkey") === spark.table("orders_b")("o_orderkey"))
      val plan = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
