package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.graft.TopKAgg
import org.scalatest.funsuite.AnyFunSuite

/** The native per-group top-k TypedImperativeAggregate: agreement with
  * the ranking-window rendering, partitioning/order/duplicate
  * invariance (set semantics on (value, id)), tie-breaks, NaN/null
  * rejection, and buffer serde.
  */
class TopKAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def topOf(df: org.apache.spark.sql.DataFrame,
      k: Int): Map[String, Seq[(Double, Long)]] =
    df.groupBy("g")
      .agg(TopKAgg.topkEntries(col("v"), col("id"), k).as("tk"))
      .select(col("g"), col("tk"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getDouble(0), e.getLong(1))).toSeq)
      .toMap

  test("agrees with the row_number window rendering") {
    val rows = (0 until 600).map { i =>
      ("g" + (i % 5), ((i * 2654435761L) % 10007).toDouble, i.toLong)
    }
    val native = topOf(rows.toDF("g", "v", "id").repartition(11), 7)
    val brute = rows.groupBy(_._1).map { case (g, rs) =>
      g -> rs.map(r => (r._2, r._3))
        .sortBy { case (v, id) => (-v, id) }.take(7).toSeq
    }
    assert(native == brute)
  }

  test("partitioning, order and duplicate invariance") {
    val base = (0 until 400).map(i => ("a", (i % 97).toDouble, i.toLong))
    val dup = base ++ base ++ base.reverse
    val t1 = topOf(base.toDF("g", "v", "id").repartition(1), 10)
    val t2 = topOf(dup.toDF("g", "v", "id").repartition(13), 10)
    assert(t1 == t2, "result must be a pure function of the input set")
  }

  test("signed zero is a value TIE (oracle comparison semantics), not an order") {
    // Double.compare ranks 0.0 above -0.0; SQL ORDER BY treats them as
    // equal — the buffer must too (review finding)
    val df = Seq(("g", 0.0, 9L), ("g", -0.0, 1L)).toDF("g", "v", "id")
    assert(topOf(df, 1) == Map("g" -> Seq((0.0, 1L))))
    // and (0.0, id) / (-0.0, id) are ONE set member, not two
    val dup = Seq(("g", 0.0, 7L), ("g", -0.0, 7L)).toDF("g", "v", "id")
    assert(topOf(dup, 5) == Map("g" -> Seq((0.0, 7L))))
  }

  test("value ties break on ascending id") {
    val df = Seq(("g", 5.0, 30L), ("g", 5.0, 10L), ("g", 5.0, 20L),
      ("g", 9.0, 99L)).toDF("g", "v", "id")
    assert(topOf(df, 3) == Map("g" -> Seq((9.0, 99L), (5.0, 10L), (5.0, 20L))))
  }

  test("groups smaller than k return everything, ranked") {
    val df = Seq(("g", 1.0, 1L), ("g", 3.0, 2L)).toDF("g", "v", "id")
    assert(topOf(df, 128) == Map("g" -> Seq((3.0, 2L), (1.0, 1L))))
  }

  test("NaN values and null value/id rows are skipped") {
    val df = Seq(("g", Some(Double.NaN), Some(1L)), ("g", None, Some(2L)),
      ("g", Some(4.0), None), ("g", Some(2.0), Some(3L)))
      .toDF("g", "v", "id")
    assert(topOf(df, 5) == Map("g" -> Seq((2.0, 3L))))
  }

  private def entries(b: org.apache.spark.sql.graft.TopKBuf): Seq[(Double, Long)] =
    (0 until b.size).map(i => (b.vs(i), b.ids(i)))

  test("serialize/deserialize roundtrip preserves the buffer") {
    val agg = org.apache.spark.sql.graft.TopKAgg(Literal(0.0), Literal(0L), 4)
    val buf = agg.createAggregationBuffer()
    Seq((3.5, 1L), (7.25, 2L), (-1.0, 3L), (7.25, 9L), (0.0, 4L))
      .foreach { case (v, i) => buf.insert(v, i) }
    val back = agg.deserialize(agg.serialize(buf))
    assert(entries(back) == entries(buf))
    assert(entries(buf) == Seq((7.25, 2L), (7.25, 9L), (3.5, 1L), (0.0, 4L)))
  }

  test("merge of partial buffers trims to the global top-k") {
    val agg = org.apache.spark.sql.graft.TopKAgg(Literal(0.0), Literal(0L), 3)
    val b1 = agg.createAggregationBuffer()
    val b2 = agg.createAggregationBuffer()
    Seq((1.0, 1L), (5.0, 2L), (3.0, 3L)).foreach { case (v, i) => b1.insert(v, i) }
    Seq((4.0, 4L), (2.0, 5L), (6.0, 6L)).foreach { case (v, i) => b2.insert(v, i) }
    assert(entries(agg.merge(b1, b2)) == Seq((6.0, 6L), (5.0, 2L), (4.0, 4L)))
  }

  test("buffer insert: fast-reject, dedup, growth and rank order under churn") {
    val buf = new org.apache.spark.sql.graft.TopKBuf(50)
    val rnd = new scala.util.Random(42)
    val ref = scala.collection.mutable.Set[(Double, Long)]()
    (0 until 5000).foreach { _ =>
      val v = rnd.nextInt(300).toDouble
      val id = rnd.nextInt(400).toLong
      buf.insert(v, id); buf.insert(v, id) // duplicate insert must collapse
      ref += ((v, id))
    }
    val expect = ref.toSeq.sortBy { case (v, id) => (-v, id) }.take(50)
    assert(entries(buf) == expect)
  }
}
