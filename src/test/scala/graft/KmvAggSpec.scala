package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.KmvAgg
import org.scalatest.funsuite.AnyFunSuite

/** The native KMV TypedImperativeAggregate: set semantics (partitioning-,
  * order- and duplicate-invariance), agreement with the compositional
  * distinct+rank rendering, buffer serialization, and bottom-k trimming.
  */
class KmvAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def sketchOf(df: org.apache.spark.sql.DataFrame,
      k: Int): Map[String, Seq[Long]] =
    df.groupBy("g")
      .agg(KmvAgg.kmvMinhashes(col("hv"), col("id"), k).as("s"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq)
      .toMap

  test("partitioning, order and duplicate invariance (set semantics)") {
    val base = (0 until 500).map(i => ("a", (i * 7919L) % 1000, i.toLong)) ++
      (0 until 300).map(i => ("b", (i * 104729L) % 5000, i.toLong))
    val dup = base ++ base ++ base.reverse // duplicates + reordering
    val df1 = base.toDF("g", "hv", "id").repartition(1)
    val df2 = dup.toDF("g", "hv", "id").repartition(13)
    val s1 = sketchOf(df1, 64)
    val s2 = sketchOf(df2, 64)
    assert(s1 == s2, "sketch must be a pure function of the input set")
    assert(s1("a").length == 64 && s1("a") == s1("a").sorted)
  }

  test("agrees with the compositional distinct+rank rendering") {
    val rows = (0 until 400).map { i =>
      ("g" + (i % 3), (i * 2654435761L) % 100000, (i % 150).toLong)
    }
    val df = rows.toDF("g", "hv", "id")
    val native = sketchOf(df.repartition(7), 32)
    val brute = rows.distinct.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3)).distinct.sorted.take(32).map(_._1).toSeq
    }
    assert(native == brute)
  }

  test("groups smaller than k return the full distinct hash set") {
    val df = Seq(("g", 5L, 1L), ("g", 3L, 2L), ("g", 5L, 1L)).toDF("g", "hv", "id")
    assert(sketchOf(df, 128) == Map("g" -> Seq(3L, 5L)))
  }

  test("hash ties with distinct ids both occupy sketch slots") {
    // two ids sharing a hash are two distinct set members (the id is the
    // dedup tie-break, mirroring ORDER BY hv, user_id in the oracle)
    val df = Seq(("g", 1L, 10L), ("g", 1L, 11L), ("g", 2L, 12L),
      ("g", 3L, 13L)).toDF("g", "hv", "id")
    assert(sketchOf(df, 3) == Map("g" -> Seq(1L, 1L, 2L)))
  }

  test("serialize/deserialize roundtrip preserves the buffer") {
    val agg = org.apache.spark.sql.graft.KmvAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(1L),
      org.apache.spark.sql.catalyst.expressions.Literal(1L), 8)
    val buf = agg.createAggregationBuffer()
    Seq((9L, 1L), (2L, 5L), (2L, 4L), (7L, 0L)).foreach { case (h, i) =>
      buf.add((h, i))
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.size() == buf.size())
    assert(agg.eval(back) != null)
    val merged = agg.merge(agg.createAggregationBuffer(), back)
    assert(merged.size() == 4)
    assert(merged.first() == ((2L, 4L)))
  }
}
