package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Pins the exact-similarity dispatch contract (round-11 verdict task 2):
  * in the dense-small-vocabulary regime a block larger than the bitmap
  * kernel's cap has NO exact plan that survives (PPJoin/count-join melt
  * without rare grams to prune on), so the dispatch must REFUSE loudly by
  * default — never silently change regime — and the opt-ins must behave:
  * `force-exact` keeps the lossless fallback, `lsh` routes to banded
  * candidates + exact per-pair verify (recall < 1 but precision 1). Every
  * call records a [[TextOps.SimilarityDecision]] like TopKDispatch's.
  *
  * The real cap (262144 docs/block) is not buildable in a test JVM, so
  * the spec passes a shrunken `blockCap` — a parameter, not mutable
  * state, so production dispatch behavior can't be flipped JVM-wide by a
  * test seam.
  */
class SimilarityDispatchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // dense SMALL vocabulary: every 2-shingle comes from a 4-word alphabet,
  // so no gram is rare — exactly the regime the bitmap branch exists for
  private def denseDocs = {
    val words = Array("aa", "bb", "cc", "dd")
    val rnd = new scala.util.Random(42)
    (1L to 40L).map { id =>
      val n = 4 + rnd.nextInt(5)
      val text = Array.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
      (id, "en", text)
    }.toDF("doc_id", "lang", "text")
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_a"), col("doc_b"), col(df.columns.last))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("in-cap dense-small-vocab takes the bitset kernel and records it") {
    val out = TextOps.similarityJoin(denseDocs, "doc_id", "lang", "text",
      shingleSize = 2, threshold = 0.5)
    assert(out.count() > 0)
    val d = TextOps.lastSimilarityDecision.get
    assert(d.kernel == "bitset")
    assert(d.maxBlock == 40L && d.maxBlock <= d.blockCap)
  }

  test("above-cap default REFUSES with the LSH-twin recommendation") {
    val ex = intercept[IllegalStateException] {
      TextOps.similarityJoin(denseDocs, "doc_id", "lang", "text",
        shingleSize = 2, threshold = 0.5, blockCap = 8L)
    }
    assert(ex.getMessage.contains("above the exact all-pairs cap"))
    assert(ex.getMessage.contains("lshCandidatePairs"))
    val d = TextOps.lastSimilarityDecision.get
    assert(d.kernel == "refused" && d.maxBlock == 40L && d.blockCap == 8L)

    val ex2 = intercept[IllegalStateException] {
      TextOps.containmentJoin(denseDocs, "doc_id", "lang", "text",
        shingleSize = 2, threshold = 0.6, blockCap = 8L)
    }
    assert(ex2.getMessage.contains("containmentJoin"))
    assert(TextOps.lastSimilarityDecision.get.kernel == "refused")
  }

  test("force-exact opt-in reproduces the bitset rows exactly") {
    val exact = rows(TextOps.similarityJoin(denseDocs, "doc_id", "lang",
      "text", shingleSize = 2, threshold = 0.5))
    val df = TextOps.similarityJoin(denseDocs, "doc_id", "lang", "text",
      shingleSize = 2, threshold = 0.5,
      aboveCap = TextOps.AboveCapForceExact, blockCap = 8L)
    val d = TextOps.lastSimilarityDecision.get
    assert(d.kernel == "count" || d.kernel == "ppjoin")
    assert(d.aboveCap == TextOps.AboveCapForceExact)
    val forced = rows(df)
    assert(forced == exact,
      s"only-forced=${(forced -- exact).take(3)} only-exact=${(exact -- forced).take(3)}")
    assert(exact.nonEmpty)
  }

  test("lsh opt-in returns a subset of the exact rows at full precision") {
    val exact = rows(TextOps.similarityJoin(denseDocs, "doc_id", "lang",
      "text", shingleSize = 2, threshold = 0.5))
    val df = TextOps.similarityJoin(denseDocs, "doc_id", "lang", "text",
      shingleSize = 2, threshold = 0.5, aboveCap = TextOps.AboveCapLsh,
      blockCap = 8L)
    assert(TextOps.lastSimilarityDecision.get.kernel == "lsh-verify")
    val lsh = rows(df)
    // recall < 1 by design; precision must be 1 (every emitted pair is a
    // true >= t pair with the exact jaccard value)
    assert(lsh.subsetOf(exact), s"phantom pairs: ${(lsh -- exact).take(5)}")
    assert(lsh.forall(_._3 >= 0.5))
  }

  test("containment lsh opt-in: subset with exact ratios") {
    val exact = TextOps.containmentJoin(denseDocs, "doc_id", "lang", "text",
      shingleSize = 2, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    val lsh = TextOps.containmentJoin(denseDocs, "doc_id", "lang", "text",
      shingleSize = 2, threshold = 0.6, aboveCap = TextOps.AboveCapLsh,
      blockCap = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSet
    assert(TextOps.lastSimilarityDecision.get.kernel == "lsh-verify")
    assert(lsh.subsetOf(exact), s"phantom pairs: ${(lsh -- exact).take(5)}")
  }
}
