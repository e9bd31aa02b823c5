package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.VectorOps

/** Pins VectorOps.pqState / adcSearch against an independent driver-side
  * reference on the same data: per-subspace Lloyd with first-k init,
  * strict-< argmin (lowest code on ties), DECIMAL(28,8)-quantized mean
  * update, and ADC distances as ascending-order double folds — the same
  * properties the v_pq / ann_adc DuckDB oracles assert cross-engine.
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val M = 8
  private val K = 4

  private def load(): Array[Array[Double]] =
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select("vec_id", "embedding")
      .orderBy("vec_id").collect()
      .map(_.getSeq[Float](1).toArray.map(_.toDouble))

  /** One per-subspace Lloyd iteration, driver-side. */
  private def referencePq(vecs: Array[Array[Double]], iters: Int)
      : (Array[Array[Array[Double]]], Array[Array[Long]]) = {
    val dims = vecs.head.length
    val d = dims / M
    var cb = Array.tabulate(M, K)((s, c) => vecs(c).slice(s * d, s * d + d))
    var counts = Array.fill(M, K)(0L)
    for (_ <- 1 to iters) {
      val sums = Array.fill(M, K, d)(java.math.BigDecimal.ZERO)
      val cnt = Array.fill(M, K)(0L)
      vecs.foreach { v =>
        for (s <- 0 until M) {
          var best = 0
          var bestD = Double.MaxValue
          for (c <- 0 until K) {
            var dd = 0.0
            var i = 0
            while (i < d) { val t = v(s * d + i) - cb(s)(c)(i); dd += t * t; i += 1 }
            if (dd < bestD) { bestD = dd; best = c }
          }
          var i = 0
          while (i < d) {
            sums(s)(best)(i) = sums(s)(best)(i).add(
              new java.math.BigDecimal(v(s * d + i))
                .setScale(8, java.math.RoundingMode.HALF_UP))
            i += 1
          }
          cnt(s)(best) += 1
        }
      }
      cb = Array.tabulate(M, K) { (s, c) =>
        if (cnt(s)(c) == 0L) cb(s)(c)
        else sums(s)(c).map(x => x.doubleValue() / cnt(s)(c))
      }
      counts = cnt
    }
    (cb, counts)
  }

  test("distributed PQ fit reproduces the driver reference bit-exactly") {
    val vecs = load()
    val (refCb, refN) = referencePq(vecs, iters = 1)
    val df = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (cb, n) = VectorOps.pqState(df, "vec_id", "embedding", M, K, iters = 1)
    for (s <- 0 until M; c <- 0 until K) {
      assert(n(s)(c) == refN(s)(c), s"count s=$s c=$c")
      assert(cb(s)(c).sameElements(refCb(s)(c)), s"centroid s=$s c=$c")
    }
  }

  test("pre-collected init reproduces the internal init collect exactly") {
    // round-15 job fusion: ann_adc collects the first 4 vectors once and
    // serves both pqState's init and the query vectors — the fused path
    // must be indistinguishable from the internal orderBy-limit collect
    val df = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val first = df.orderBy("vec_id")
      .select(org.apache.spark.sql.functions.col("vec_id").cast("long"),
        org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.col("embedding"),
          x => x.cast("double")))
      .limit(K)
      .collect().map(_.getSeq[Double](1).toArray)
    val (cbA, nA) = VectorOps.pqState(df, "vec_id", "embedding", M, K, 1)
    val (cbB, nB) = VectorOps.pqState(df, "vec_id", "embedding", M, K, 1,
      initRows = first)
    for (s <- 0 until M; c <- 0 until K) {
      assert(nA(s)(c) == nB(s)(c), s"count s=$s c=$c")
      assert(cbA(s)(c).sameElements(cbB(s)(c)), s"centroid s=$s c=$c")
    }
  }

  test("ADC distances are the exact table-lookup sums of the encoded codes") {
    val vecs = load()
    val df = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (cb, _) = VectorOps.pqState(df, "vec_id", "embedding", M, K, iters = 1)
    val d = cb(0)(0).length
    val qs = Array((0L, vecs(0)), (1L, vecs(1)))
    // reference: encode every vector, sum per-subspace lookups ascending
    def encode(v: Array[Double]): Array[Int] = Array.tabulate(M) { s =>
      var best = 0; var bestD = Double.MaxValue
      for (c <- 0 until K) {
        var dd = 0.0; var i = 0
        while (i < d) { val t = v(s * d + i) - cb(s)(c)(i); dd += t * t; i += 1 }
        if (dd < bestD) { bestD = dd; best = c }
      }
      best
    }
    def adc(q: Array[Double], codes: Array[Int]): Double = {
      var total = 0.0
      for (s <- 0 until M) {
        var dd = 0.0; var i = 0
        while (i < d) { val t = q(s * d + i) - cb(s)(codes(s))(i); dd += t * t; i += 1 }
        total += dd
      }
      total
    }
    val want = qs.flatMap { case (qid, q) =>
      vecs.zipWithIndex.filter(_._2 != qid)
        .map { case (v, id) =>
          val bd = new java.math.BigDecimal(adc(q, encode(v)))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          (qid, id.toLong, bd)
        }
        .sortBy { case (_, id, dist) => (dist, id) }
        .take(10)
        .zipWithIndex
        .map { case ((qid2, id, dist), i) => (qid2, id, (i + 1).toLong, dist) }
    }.toSet
    val got = VectorOps.adcSearch(df, "vec_id", "embedding", cb, qs, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getDouble(3)))
      .toSet
    assert(got == want)
  }

  test("IVF-PQ hits lie in probed cells with exact full-scan ADC distances") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (cb, _) = VectorOps.pqState(df, "vec_id", "embedding", M, K, iters = 1)
    val cents = VectorOps.trainCentroids(df, "vec_id", "embedding", 16)
    val assigned = VectorOps.ivfAssign(df, "vec_id", "embedding", cents)
    val vecs = load()
    val qs = Array((0L, vecs(0)), (1L, vecs(1)))
    val got = VectorOps.ivfAdcSearch(assigned, cents, cb, qs,
      "vec_id", "embedding", k = 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.nonEmpty)
    // probe sets re-derived independently: cosine vs collected centroids
    val cvs = cents.select("cid", "cvec").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
      .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dp = a.zip(b).map { case (x, y) => x * y }.sum
      dp / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val probes = qs.map { case (qid, q) =>
      qid -> cvs.map { case (cid, cv) => (-cos(q, cv), cid) }
        .sorted.take(4).map(_._2).toSet
    }.toMap
    val bucketOf = assigned.select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // full-scan ADC on the same queries for distance cross-check
    val full = VectorOps.adcSearch(df, "vec_id", "embedding", cb, qs,
      k = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    got.foreach { case (qid, vid, dist) =>
      assert(probes(qid).contains(bucketOf(vid)),
        s"hit $vid for q$qid outside probed cells")
      assert(full((qid, vid)) == dist,
        s"ADC distance drift for ($qid, $vid)")
    }
  }

  test("residual IVF-PQ: probed cells only, driver-exact residual ADC sums") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val vecs = load()
    val qs = Array((0L, vecs(0)), (1L, vecs(1)))
    val got = VectorOps.ivfPqSearch(df, "vec_id", "embedding", qs,
      nCells = 16, m = M, k = K, kTop = 10, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.nonEmpty)
    // independent driver replay of the whole residual pipeline
    val cents = VectorOps.trainCentroids(df, "vec_id", "embedding", 16)
    val assigned = VectorOps.ivfAssign(df, "vec_id", "embedding", cents)
    val centArr = VectorOps.centroidArrays(cents)
    val res = VectorOps.residualFrame(assigned, "embedding", centArr)
    val (cb, _) = VectorOps.pqState(res, "vec_id", "__resv", M, K, iters = 1)
    val d = cb(0)(0).length
    val bucketOf = assigned.select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val resOf = res.select("vec_id", "__resv").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dp = a.zip(b).map { case (x, y) => x * y }.sum
      dp / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    def encode(rv: Array[Double]): Array[Int] = Array.tabulate(M) { s =>
      var best = 0; var bestD = Double.MaxValue
      for (c <- 0 until K) {
        var dd = 0.0; var i = 0
        while (i < d) { val t = rv(s * d + i) - cb(s)(c)(i); dd += t * t; i += 1 }
        if (dd < bestD) { bestD = dd; best = c }
      }
      best
    }
    got.foreach { case (qid, vid, dist) =>
      val q = qs.find(_._1 == qid).get._2
      val probes = centArr.indices.map(c => (-cos(q, centArr(c)), c))
        .sorted.take(4).map(_._2).toSet
      val cell = bucketOf(vid)
      assert(probes.contains(cell), s"hit $vid for q$qid outside probed cells")
      val qres = q.indices.map(i => q(i) - centArr(cell)(i)).toArray
      val codes = encode(resOf(vid))
      var total = 0.0
      for (s <- 0 until M) {
        var dd = 0.0; var i = 0
        while (i < d) { val t = qres(s * d + i) - cb(s)(codes(s))(i); dd += t * t; i += 1 }
        total += dd
      }
      val want = new java.math.BigDecimal(total)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(want == dist, s"residual ADC drift for ($qid, $vid): $want vs $dist")
    }
  }

  test("ADC top-k recalls a usable fraction of the exact L2 top-k") {
    val vecs = load()
    val df = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (cb, _) = VectorOps.pqState(df, "vec_id", "embedding", M, K, iters = 1)
    val qs = Array((0L, vecs(0)), (1L, vecs(1)), (2L, vecs(2)))
    val got = VectorOps.adcSearch(df, "vec_id", "embedding", cb, qs, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def l2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val t = a(i) - b(i); acc += t * t; i += 1 }
      acc
    }
    val recalls = qs.map { case (qid, q) =>
      val exact = vecs.zipWithIndex.filter(_._2 != qid)
        .map { case (v, id) => (l2(q, v), id.toLong) }
        .sortBy(identity).take(10).map(_._2).toSet
      (exact intersect got(qid)).size / 10.0
    }
    // k=4 codes per subspace is a coarse 8-byte quantizer; the gate is a
    // usefulness floor, not a tuning claim (mean over 3 queries).
    assert(recalls.sum / recalls.length >= 0.2,
      s"mean ADC recall@10 ${recalls.sum / recalls.length}")
  }
}
