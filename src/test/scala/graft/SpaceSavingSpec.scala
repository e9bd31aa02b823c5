package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpaceSaving

/** Misra-Gries merge-tree guarantees on adversarial synthetic streams:
  * for capacity c over N items, every estimate undercounts by at most
  * N/(c+1), never overcounts, the summary never exceeds c entries, and
  * every item with true count above N/(c+1) is present — independent of
  * how the stream is partitioned (the property the treeAggregate plan
  * relies on and q_approx_topk_bounds gates on the fixture corpus).
  */
class SpaceSavingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def check(items: Seq[String], cap: Int, parts: Int): Unit = {
    import spark.implicits._
    val ds = spark.createDataset(items).repartition(parts)
    val sketch = SpaceSaving.summarize(ds, cap)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bound = items.size.toLong / (cap + 1)
    assert(sketch.size <= cap, s"summary exceeded capacity: ${sketch.size}")
    sketch.foreach { case (w, est) =>
      val t = exact(w)
      assert(est <= t, s"overcount on $w: est=$est true=$t")
      assert(t - est <= bound, s"undercount beyond bound on $w: est=$est true=$t bound=$bound")
    }
    exact.foreach { case (w, t) =>
      if (t > bound) assert(sketch.contains(w), s"heavy hitter $w (n=$t > $bound) missing")
    }
  }

  test("zipf-skewed stream, several partitionings") {
    val rnd = new scala.util.Random(7)
    // Zipf-ish: item i appears ~ 20000/i times
    val items = rnd.shuffle(
      (1 to 200).flatMap(i => Seq.fill(20000 / i)(s"w$i")).toVector)
    for (parts <- Seq(1, 3, 16)) check(items, cap = 12, parts = parts)
  }

  test("uniform stream (no true heavy hitters) still bounded") {
    val rnd = new scala.util.Random(11)
    val items = rnd.shuffle((1 to 50).flatMap(i => Seq.fill(100)(s"u$i")).toVector)
    check(items, cap = 8, parts = 5)
  }

  test("adversarial: heavy run of one item after diverse prefix") {
    val items = (1 to 3000).map(i => s"d$i") ++ Seq.fill(5000)("hot")
    check(items, cap = 10, parts = 4)
  }
}
