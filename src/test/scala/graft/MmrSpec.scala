package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Pins VectorOps.mmrSelect against an independent driver-side greedy
  * MMR on the same data: same relevance/penalty arithmetic (ascending
  * dot fold, 0.7/0.3 literals), same (score DESC, id) tie-break. Data
  * is chosen so relevance-only top-k and MMR DISAGREE — near-duplicate
  * vectors crowd the top — or the diversity term would be untested.
  */
class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def referenceMmr(vecs: Map[Long, Array[Double]], qId: Long,
      k: Int): Seq[(Int, Long, Double)] = {
    val nrm = vecs.view.mapValues(v => math.sqrt(dot(v, v))).toMap
    val q = vecs(qId)
    val cands = vecs.keys.filter(_ != qId).toSeq.sorted
    val rel = cands.map(id =>
      id -> dot(vecs(id), q) / (nrm(id) * nrm(qId))).toMap
    val selected = scala.collection.mutable.ArrayBuffer[Long]()
    val out = Seq.newBuilder[(Int, Long, Double)]
    for (step <- 1 to k) {
      val scored = cands.filterNot(selected.contains).map { id =>
        val pen =
          if (selected.isEmpty) 0.0
          else selected.map(s =>
            dot(vecs(id), vecs(s)) / (nrm(id) * nrm(s))).max
        id -> (0.7 * rel(id) - 0.3 * pen)
      }
      val (bestId, bestScore) = scored.minBy { case (id, sc) => (-sc, id) }
      selected += bestId
      out += ((step, bestId,
        BigDecimal(bestScore).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
    }
    out.result()
  }

  test("greedy MMR matches the reference and diversifies") {
    import spark.implicits._
    // query q; a-cluster hugs the query (high rel, mutually near-dup);
    // b/c are less relevant but diverse
    val vecs: Map[Long, Array[Double]] = Map(
      0L -> Array(1.0, 0.0, 0.0, 0.0),
      1L -> Array(0.98, 0.17, 0.0, 0.05),  // a1
      2L -> Array(0.97, 0.20, 0.02, 0.0),  // a2 ~ a1
      3L -> Array(0.96, 0.23, 0.0, 0.08),  // a3 ~ a1
      4L -> Array(0.70, 0.70, 0.10, 0.0),  // b: diverse, decent rel
      5L -> Array(0.60, 0.00, 0.80, 0.0))  // c: diverse, lower rel
    val df = vecs.toSeq.sortBy(_._1)
      .map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
    val got = VectorOps.mmrSelect(df, "vec_id", "embedding", 0L, 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val ref = referenceMmr(vecs, 0L, 4)
    assert(got == ref, s"got $got vs ref $ref")
    // diversity actually bit: pure-relevance order would be 1,2,3,4
    val relOrder = Seq(1L, 2L, 3L, 4L)
    assert(got.map(_._2) != relOrder, "MMR degenerated to relevance-only")
  }

  test("fixture embeddings: first pick is the relevance argmax") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val got = VectorOps.mmrSelect(emb, "vec_id", "embedding", 0L, 2).collect()
    assert(got.length == 2 && got(0).getInt(0) == 1)
    // step-2 score can only be <= step-1 (penalty is nonnegative,
    // relevance of the runner-up is <= the argmax's)
    assert(got(1).getDouble(2) <= got(0).getDouble(2) + 1e-12)
  }
}
