package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{TextOps, VectorOps}

/** Regression pins for the round-13 kernel-plane review findings — each
  * test encodes a contract the review found claimed-but-unenforced (or
  * silently violated) in the operator kernels:
  *  - exact k-NN: NaN cosines (zero-norm vectors) must never occupy top-k
  *    slots (pre-fix they entered via the filled<k short-circuit, could
  *    never be displaced, and silently truncated every real neighbor list);
  *  - ANN entry points that cast ids to long must REFUSE non-numeric ids
  *    at plan time (pre-fix the null-propagating =!= filter returned a
  *    silently empty result);
  *  - knnGraph's label takes the same guard (the exact branch casts it to
  *    int while the IVF branch carries it raw — a string label would make
  *    semantics depend on the size dispatch);
  *  - lsh buckets() must refuse planes > 64 (1L << p wraps mod 64 and the
  *    + combine carries collisions into higher bits);
  *  - the BPE trainer stops when no mergeable pair remains (iters is a
  *    budget, not a guarantee — pre-fix an exhausted vocabulary threw
  *    ArrayIndexOutOfBoundsException from the argmax).
  */
class KernelContractsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def emb(rows: Seq[(Int, Long, Array[Float])]) =
    rows.toDF("label", "vec_id", "embedding")

  // 5 well-formed vectors + 1 zero-norm (cosine NaN against everything)
  private val withZeroNorm = Seq(
    (1, 1L, Array(1.0f, 0.0f)),
    (1, 2L, Array(0.9f, 0.1f)),
    (1, 3L, Array(0.8f, 0.2f)),
    (1, 4L, Array(0.7f, 0.3f)),
    (1, 5L, Array(0.6f, 0.4f)),
    (1, 99L, Array(0.0f, 0.0f)))

  private def assertFullLists(df: org.apache.spark.sql.DataFrame,
      k: Int): Unit = {
    val byQ = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"),
        r.getAs[Double]("cos_r")))
      .groupBy(_._1)
    (1L to 5L).foreach { q =>
      val ns = byQ.getOrElse(q, Array.empty)
      assert(ns.length == k,
        s"q=$q neighbor list truncated to ${ns.length} (NaN slot theft?)")
      assert(ns.forall(t => !t._3.isNaN && t._2 != 99L),
        s"q=$q returned a NaN/zero-norm neighbor: ${ns.toSeq}")
    }
    // the zero-norm query has no defined cosine to anything: empty list
    assert(!byQ.contains(99L),
      s"zero-norm query emitted neighbors: ${byQ.get(99L).map(_.toSeq)}")
  }

  test("exact kNN (single-block): zero-norm vectors never steal top-k slots") {
    assertFullLists(
      VectorOps.knnGraph(emb(withZeroNorm), 3, exactBlockMax = Long.MaxValue),
      k = 3)
  }

  test("exact kNN (chunked): zero-norm vectors never steal top-k slots") {
    assertFullLists(
      VectorOps.exactKnnKernel(emb(withZeroNorm), 3, chunkTarget = 2L),
      k = 3)
  }

  test("ANN entry points refuse non-numeric id columns at plan time") {
    val sdf = Seq(("doc1", Array(1.0f, 0.0f)), ("doc2", Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val cb = Array(Array(Array(0.0, 0.0)))
    val qs = Array((0L, Array(1.0, 0.0)))
    val e1 = intercept[IllegalArgumentException] {
      VectorOps.adcSearch(sdf, "vec_id", "embedding", cb, qs, k = 2)
    }
    assert(e1.getMessage.contains("adcSearch"))
    val e2 = intercept[IllegalArgumentException] {
      VectorOps.ivfPqSearch(sdf, "vec_id", "embedding", qs,
        nCells = 2, m = 1, k = 2, kTop = 2, nProbe = 1)
    }
    assert(e2.getMessage.contains("ivfPqSearch"))
  }

  test("knnGraph refuses a non-numeric label (dispatch-dependent semantics otherwise)") {
    val sdf = Seq(("7", 1L, Array(1.0f, 0.0f)), ("07", 2L, Array(0.0f, 1.0f)))
      .toDF("label", "vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      VectorOps.knnGraph(sdf, 1)
    }
    assert(e.getMessage.contains("label"))
  }

  test("lsh buckets refuses planes outside [1,64]") {
    import org.apache.spark.sql.functions.col
    val e = intercept[IllegalArgumentException] {
      VectorOps.buckets(col("embedding"), planes = 65)
    }
    assert(e.getMessage.contains("64"))
    // 64 itself is legal (the full bucket-id width)
    VectorOps.buckets(col("embedding"), planes = 64)
  }

  test("BPE trainer stops when the vocabulary is fully merged (iters is a budget)") {
    // one two-char word: exactly one learnable merge; iters = 5 must
    // return that single rule instead of indexing into an empty argmax
    val docs = Seq("ab", "ab", "ab").toDF("text")
    val merges = TextOps.bpeMerges(docs, "text", iters = 5).collect()
    assert(merges.length == 1, s"expected 1 merge, got ${merges.toSeq}")
    assert(merges(0).getAs[String]("merged") == "ab")
  }
}
