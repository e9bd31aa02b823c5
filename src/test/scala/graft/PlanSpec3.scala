package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-4 board rows: each query's Scaladoc makes a
  * scale claim (shuffle count, broadcast, no self-pairing); these tests
  * keep the physical plans honest about them.
  */
class PlanSpec3 extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  private def exchanges(p: String): Int = raw"\(\d+\) Exchange".r.findAllIn(p).size

  test("pl_training_select: the dedup-key window is the ONLY data shuffle") {
    val p = plan("pl_training_select")
    // one Exchange for the keeper window; everything else row-local
    assert(exchanges(p) == 1, s"expected exactly 1 exchange:\n$p")
    assert(!p.contains("CartesianProduct"), s"cross join crept in:\n$p")
  }

  test("ts_ewma: one per-key window pass, no joins") {
    val p = plan("ts_ewma")
    assert(exchanges(p) == 1, s"expected exactly 1 exchange:\n$p")
    assert(!p.contains("Join"), s"ewma must not join:\n$p")
  }

  test("ts_resample/ts_interpolate: shuffles only on the key, no cross joins") {
    for (n <- Seq("ts_resample", "ts_interpolate")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$n degenerated:\n$p")
      // bounded shuffle count: bounds agg + grid/fill windows, never a
      // per-gap join explosion
      assert(exchanges(p) <= 4, s"$n shuffles too much:\n$p")
    }
  }

  test("tx_ppx_bucket: classification joins the cut table by broadcast") {
    val p = plan("tx_ppx_bucket")
    assert(p.contains("BroadcastHashJoin"), s"cut table not broadcast:\n$p")
  }

  test("dd_semantic assignment stage stays shuffle-free up to the pairing") {
    // the full query shuffles for blockedCosinePairs + the dup join; the
    // assignment subtree alone must not (same pin as ivfAssign)
    import org.apache.spark.sql.functions._
    import graft.operators.VectorOps
    val e = Tables.load(spark, sf, "embeddings")
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("cvec"))
    val p = VectorOps.ivfAssign(e, "vec_id", "embedding", cents)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"assignment shuffles or joins:\n$p")
  }

  test("tx_zipf: vocabulary top-50 is TakeOrdered, never a global dictionary sort") {
    val p = plan("tx_zipf")
    assert(p.contains("TakeOrderedAndProject"), s"top-k fell back to a sort:\n$p")
  }

  test("ts_changepoint: prefix sums, totals and argmin share ONE exchange") {
    val p = plan("ts_changepoint")
    assert(exchanges(p) == 1, s"expected exactly 1 exchange:\n$p")
    assert(!p.contains("Join"), s"changepoint must not join:\n$p")
  }

  test("q_markov: lead window + transition agg, no joins") {
    val p = plan("q_markov")
    assert(!p.contains("Join"), s"markov must not join:\n$p")
    assert(exchanges(p) <= 3, s"markov shuffles too much:\n$p")
  }

  test("v_knn_graph: candidate join stays inside label blocks") {
    val p = plan("v_knn_graph")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"knn graph degenerated to all-pairs:\n$p")
  }

  test("v_outliers: centroids and label stats reach the corpus by broadcast") {
    val p = plan("v_outliers")
    assert(p.contains("BroadcastHashJoin"), s"centroid join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus-side shuffle join crept in:\n$p")
  }

  test("tx_normalize: row-local canonicalization, zero exchanges") {
    val p = plan("tx_normalize")
    assert(exchanges(p) == 0, s"canonicalization must not shuffle:\n$p")
    assert(p.contains("nfc_normalize"), s"native NFC expression missing:\n$p")
  }

  test("tx_pmi: unigram table and totals reach the pair table by broadcast") {
    val p = plan("tx_pmi")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus-side shuffle join crept in:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"unigram join not broadcast:\n$p")
  }

  test("tx_novelty / dd_cross_split_leak: gram-key joins, no cartesian") {
    for (n <- Seq("tx_novelty", "dd_cross_split_leak")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$n degenerated to all-pairs:\n$p")
    }
  }

  test("q_rfm: quintile windows are nation-partitioned, never global") {
    val p = plan("q_rfm")
    // a global ntile would plan Exchange SinglePartition before the window
    assert(!p.contains("Exchange SinglePartition"),
      s"global single-partition window:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"nation dim join not broadcast:\n$p")
  }

  test("ts_anomaly_mad: per-type stats reach the corpus by broadcast") {
    val p = plan("ts_anomaly_mad")
    assert(p.contains("BroadcastHashJoin"), s"stats join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"corpus-side shuffle join crept in:\n$p")
  }

  test("v_pagerank: keyed edge joins only, never a cartesian") {
    val p = plan("v_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"pagerank degenerated to all-pairs:\n$p")
  }

  test("v_quantize: row-local quantization, zero exchanges") {
    val p = plan("v_quantize")
    assert(exchanges(p) == 0, s"quantization must not shuffle:\n$p")
  }

  test("dd_source_overlap: gram-key self-join, totals broadcast") {
    val p = plan("dd_source_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"overlap degenerated to all-pairs:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"totals join not broadcast:\n$p")
  }

  test("q_user_entropy: aggs share the user_id key, no wide joins") {
    val p = plan("q_user_entropy")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"entropy degenerated:\n$p")
    assert(exchanges(p) <= 3, s"entropy shuffles too much:\n$p")
  }

  test("v_drift / ts_seasonality: keyed aggs only, no cartesian") {
    for (n <- Seq("v_drift", "ts_seasonality")) {
      val p = plan(n)
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$n degenerated:\n$p")
    }
    // seasonality: one data shuffle (type,dow agg) + the 7-rows-per-type
    // share window — never a corpus-wide join
    assert(!plan("ts_seasonality").contains("Join"),
      "seasonality must not join")
  }

  test("pl_curriculum: two-level rank, no fixed-cardinality sort, broadcast-only joins") {
    // round-11 rewrite: lang has ~5 values regardless of corpus size, so
    // the old per-lang ntile window serialized 1/5 of all documents
    // through one sort task; the two-level rendering ranks within
    // data-scaled difficulty buckets and derives ntile arithmetically.
    // The only joins are the metadata-scale offsets/lang-count
    // broadcasts.
    val p = plan("pl_curriculum")
    assert(!p.contains("Exchange SinglePartition"),
      s"global curriculum window crept in:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"only broadcast (metadata-scale) joins allowed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"offsets must broadcast:\n$p")
  }

  test("knnGraph big-block path: every join keyed on the IVF cell, never label-wide") {
    import graft.operators.VectorOps
    val e = Tables.load(spark, sf, "embeddings")
    // exactBlockMax = 0 forces the path the dispatch takes when a label
    // block outgrows the quadratic budget (the round-5 scale-killer)
    val p = VectorOps.knnGraph(e, 5, exactBlockMax = 0)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"cell path degenerated:\n$p")
    // the candidate join must carry the cell id in its keys — a key list
    // of label alone is the quadratic label-wide self-join
    val keyLists = raw"Left keys \[\d+\]: \[([^\]]*)\]".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(keyLists.nonEmpty, s"no equi-join keys found:\n$p")
    assert(keyLists.forall(_.contains("bucket")),
      s"join not keyed on the cell:\n$keyLists\n$p")
    // probe selection is row-local over literal centroids: no window (and
    // with it a corpus×nCells shuffle) before the candidate join. The
    // final per-qid top-k goes through TopKDispatch (round-12): on the
    // IVF candidate mass (rows/group ≈ cell size) the shuffled-mass model
    // picks the NATIVE aggregate — one k-entry buffer per (group, map
    // partition), no second full-candidate shuffle — so the plan carries
    // a TopKAgg ObjectHashAggregate pair and ZERO ranking windows.
    assert(raw"\(\d+\) Window(?!GroupLimit)".r.findAllIn(p).isEmpty,
      s"dispatcher's native pick must not plan a ranking window:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"native TopKAgg rendering missing from the cell path:\n$p")
  }

  test("dd_cross_split_leak big-corpus path: bloom prefilter lands scan-side on the probe") {
    // bloomDocBound = 0 forces the corpus-scale dispatch branch; the
    // train-gram sketch must gate the test-gram probe BEFORE the equi-join
    // (might_contain in the plan), and the result must be unchanged —
    // blooms cannot false-negative and the join adjudicates survivors
    val forced = graft.queries.DedupQueries.crossSplitLeak(spark, sf, bloomDocBound = 0)
    val p = forced.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("might_contain"), s"bloom prefilter missing from plan:\n$p")
    val plain = graft.queries.DedupQueries.crossSplitLeak(spark, sf)
    val pp = plain.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!pp.contains("might_contain"),
      s"small-corpus path must not pay the sketch build:\n$pp")
    // lossless: identical rows either way
    val a = forced.collect().map(_.toString).sorted
    val b = plain.collect().map(_.toString).sorted
    assert(a.sameElements(b), "bloom prefilter changed the result")
  }

  test("mm_audio / v_dim_reduce: row-local codec and projection, zero exchanges") {
    for (n <- Seq("mm_audio", "v_dim_reduce")) {
      val p = plan(n)
      assert(exchanges(p) == 0, s"$n must stay row-local:\n$p")
      assert(!p.contains("Join"), s"$n must not join:\n$p")
    }
  }

  test("tx_bm25: df and corpus stats reach the postings by broadcast, top-k bounded") {
    val p = plan("tx_bm25")
    // the df (|q| rows) and stats (1 row) sides must broadcast; the only
    // wide exchanges carry the pruned postings and the dl join
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"query-side tables not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }

  test("pl_dedup_funnel: no cartesian; stages share the cached gram explode") {
    val p = plan("pl_dedup_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"funnel degenerated:\n$p")
    // the span stage reuses the persisted gram explode, so the whole
    // 4-stage funnel stays within a bounded exchange budget
    assert(exchanges(p) <= 10, s"funnel shuffles too much:\n$p")
  }

  test("tx_ngram_coverage: rank window runs over the vocab, cuts broadcast") {
    val p = plan("tx_ngram_coverage")
    assert(p.contains("BroadcastExchange"), s"cut table not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept in:\n$p")
  }

  test("q_null_semantics: all three not-matched spellings plan as hash anti joins") {
    val p = plan("q_null_semantics")
    // NOT IN (nullable), NOT IN (clean), NOT EXISTS — each becomes a
    // BroadcastHashJoin LeftAnti (the nullable one is Spark's null-aware
    // variant, broadcast-only by construction); none may degenerate to a
    // nested-loop join
    assert(raw"BroadcastHashJoin LeftAnti".r.findAllIn(p).size == 3,
      s"expected 3 broadcast anti joins:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"anti join degenerated to nested loop:\n$p")
  }
}
