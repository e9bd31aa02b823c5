package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Pins VectorOps.kmeansLloyd against an independent driver-side Lloyd
  * on the same data: same init (first k by id), same argmin tie-break
  * (lowest cid), same decimal-quantized mean update. The distributed
  * plan (literal-centroid scoring + (cid, dim) shuffle) must reproduce
  * the reference bit-exactly — the property the v_kmeans DuckDB oracle
  * also asserts cross-engine.
  */
class KmeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def referenceLloyd(vecs: Array[Array[Double]], k: Int,
      iters: Int): (Array[Array[Double]], Array[Long]) = {
    var cents = vecs.take(k).map(_.clone())
    var counts = Array.fill(k)(0L)
    for (_ <- 1 to iters) {
      val dimSums = Array.fill(k, cents.head.length)(java.math.BigDecimal.ZERO)
      val cnt = Array.fill(k)(0L)
      vecs.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        for (c <- 0 until k) {
          var d = 0.0
          var i = 0
          while (i < v.length) {
            val t = v(i) - cents(c)(i); d += t * t; i += 1
          }
          if (d < bestD) { bestD = d; best = c } // strict < keeps lowest cid on ties
        }
        var i = 0
        while (i < v.length) {
          dimSums(best)(i) = dimSums(best)(i).add(
            new java.math.BigDecimal(v(i)).setScale(8, java.math.RoundingMode.HALF_UP))
          i += 1
        }
        cnt(best) += 1
      }
      cents = (0 until k).map { c =>
        if (cnt(c) == 0L) cents(c)
        else dimSums(c).map(s => s.doubleValue() / cnt(c))
      }.toArray
      counts = cnt
    }
    (cents, counts)
  }

  test("distributed Lloyd reproduces the driver reference bit-exactly") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val local = df.select("vec_id", "embedding")
      .orderBy("vec_id").collect()
      .map(r => r.getSeq[Float](1).toArray.map(_.toDouble))
    val (refC, refN) = referenceLloyd(local, k = 4, iters = 2)
    val got = VectorOps.kmeansLloyd(df, "vec_id", "embedding", k = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.length == 4 * local.head.length)
    got.foreach { case (cid, dim, mv, n) =>
      assert(n == refN(cid.toInt), s"cluster size mismatch for cid=$cid")
      assert(mv == refC(cid.toInt)(dim.toInt - 1),
        s"centroid value mismatch at cid=$cid dim=$dim")
    }
    assert(got.map(_._4).sum == local.length.toLong * local.head.length,
      "assignment must partition the input")
  }
}
