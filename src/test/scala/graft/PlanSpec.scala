package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions: these are the properties that keep the
  * queries viable at 100 TB — filter/projection pushdown into the parquet
  * scan, broadcast of small dimensions, whole-stage codegen over custom
  * expressions, no accidental cross joins.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q1_agg pushes the shipdate filter and prunes columns at the scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter:\n$p")
    // 7 needed columns, not all 11
    assert(p.contains("l_returnflag") && !p.contains("l_suppkey"),
      s"column pruning failed:\n$p")
  }

  test("j_broadcast plans a broadcast hash join with pushed dim filter") {
    val p = plan("j_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast join:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(p_size), LessThan(p_size,10)"),
      s"dim filter not pushed:\n$p")
  }

  test("j_star broadcasts both small dims") {
    val p = plan("j_star")
    // detail headers like "(6) BroadcastHashJoin" — one per join node
    assert(raw"\(\d+\) BroadcastHashJoin".r.findAllIn(p).size == 2,
      s"expected 2 broadcasts:\n$p")
  }

  test("j_semi and j_anti use semi/anti joins, not materialized subqueries") {
    assert(plan("j_semi").contains("LeftSemi"), "semi join missing")
    assert(plan("j_anti").contains("LeftAnti"), "anti join missing")
  }

  test("row-level operator queries stay in one codegen stage, no shuffle") {
    // tx_langid / tx_quality joined this list in round 3: their stopword
    // scoring moved from interpreted filter(isin) lambdas to the native
    // count_in_set expression
    for (name <- Seq("fn_crc", "op_edit_affix", "op_math_arith", "fn_salinity",
        "tx_langid", "tx_quality")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name shuffles unexpectedly:\n$p")
      // formatted mode stars codegen'd operators: "* Project (3)"
      assert(p.contains("* Project"), s"$name fell out of codegen:\n$p")
    }
  }

  test("custom Catalyst expressions participate in codegen (no fallback)") {
    val df = SparkEntry.queries("fn_crc")(spark, sf)
    val codegen = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(codegen.contains("graft.functions.Impls.crc16Modbus"),
      s"crc16 not inlined into generated code:\n${codegen.take(2000)}")
    // the perf-critical natives that replaced interpreted array lambdas
    // must also inline: shingles (dedup pipelines), vec_dot (ANN),
    // znorm_dist (motif search) — checked on shuffle-free projections so
    // AQE can't hide the codegen subtree
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions
    import graft.operators.TextOps
    def inlined(df: org.apache.spark.sql.DataFrame, sym: String): Unit = {
      val cg = org.apache.spark.sql.execution.debug.codegenString(
        df.queryExecution.executedPlan)
      assert(cg.contains(s"graft.functions.Impls.$sym"), s"$sym not inlined")
    }
    val docs = Tables.load(spark, sf, "documents")
    inlined(docs.select(TextOps.shingles(TextOps.tokens(col("text")), 5)), "shingles")
    val emb = Tables.load(spark, sf, "embeddings")
    inlined(emb.select(GraftFunctions.vec_dot(col("embedding"), col("embedding"))),
      "vecDot")
    inlined(emb.select(GraftFunctions.znorm_dist(
      col("embedding"), col("embedding"))), "znormDist")
    // dtw_dist (ts_dtw) — the DP kernel must also stay inside codegen
    // (CreateArray is codegen-capable; transform() is CodegenFallback and
    // would evict the whole projection, testing nothing)
    inlined(emb.select(GraftFunctions.dtw_dist(
      array(col("vec_id"), col("vec_id") + 1),
      array(col("vec_id") + 2, col("vec_id")))), "dtwDist")
    inlined(docs.select(GraftFunctions.count_in_set(
      TextOps.tokens(col("text")), array(lit("the"), lit("a")))), "countIn")
    inlined(docs.select(GraftFunctions.minhash_sig(
      TextOps.shingles(TextOps.tokens(col("text")), 3), lit(8))), "minhashSig")
  }

  test("dedup LSH candidates run through the native bucket-run operator") {
    val p = plan("dd_minhash_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LSH degenerated to cross join:\n$p")
    // round-10: the banded self-equi-join was replaced by LshSelfJoinExec
    // (one clustering shuffle of one table copy, no hash build)
    assert(p.contains("LshSelfJoin"), s"native LSH operator missing:\n$p")
    assert(!p.contains("SortMergeJoin(band") && !p.contains("ShuffledHashJoin(band"),
      s"banded self-join resurfaced as a generic join:\n$p")
  }

  test("ann_topk broadcasts the query vectors") {
    val p = plan("ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side not broadcast:\n$p")
  }
}

class PlanSpec2 extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("j_range binning avoids nested-loop/cartesian joins") {
    val p = plan("j_range")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated:\n$p")
  }

  test("j_asof window rendering needs exactly one shuffle") {
    val p = plan("j_asof")
    assert(raw"\(\d+\) Exchange".r.findAllIn(p).size == 1, s"expected 1 exchange:\n$p")
  }

  test("tx_topk_ngrams: partial aggregation + top-k, no global sort") {
    val p = plan("tx_topk_ngrams")
    // two-phase hash agg: a partial HashAggregate runs before the
    // exchange so the shuffle carries per-partition counts, not grams
    assert(raw"HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    // limit+order plans as TakeOrderedAndProject (per-partition top-k),
    // never a full global Sort of the gram dictionary
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("dd_ngram_jaccard: neither similarity-join branch degenerates to a cross join") {
    import graft.operators.TextOps
    val docs = Tables.load(spark, sf, "documents")
    def shape(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // dense-vocab branch: inverted-index count-join on the hashed gram
    val dense = shape(TextOps.similarityJoin(
      docs, "doc_id", "lang", "text", 2, 0.5, denseVocabAvgDf = 0.0,
      smallVocabBitset = false))
    assert(!dense.contains("CartesianProduct"), s"count-join cross:\n$dense")
    assert(dense.contains("xxhash64"), s"gram hashing missing:\n$dense")
    // sparse-vocab branch: PPJoin prefix candidates, never a cross join
    val sparse = shape(TextOps.similarityJoin(
      docs, "doc_id", "lang", "text", 2, 0.5, denseVocabAvgDf = 1e18,
      smallVocabBitset = false))
    assert(!sparse.contains("CartesianProduct"), s"ppjoin cross:\n$sparse")
    // small-vocab bitmap branch (what this fixture dispatches to): no
    // join operator AT ALL — one groupByKey exchange into the popcount
    // kernel, SortMergeJoin/ShuffledHashJoin absent by construction
    val bitset = shape(TextOps.similarityJoin(
      docs, "doc_id", "lang", "text", 2, 0.5))
    assert(!bitset.contains("CartesianProduct"), s"bitset cross:\n$bitset")
    assert(bitset.contains("MapGroups"), s"bitset kernel missing:\n$bitset")
    assert(!bitset.contains("SortMergeJoin") && !bitset.contains("ShuffledHashJoin"),
      s"bitset branch still joins grams:\n$bitset")
    // the registered query (dispatched on measured stats) as a whole
    val p = plan("dd_ngram_jaccard")
    assert(!p.contains("CartesianProduct"), s"jaccard cross join:\n$p")
  }

  test("q_sort_global plans a range-partitioned sort; q_topk stays TakeOrdered") {
    val sort = plan("q_sort_global")
    assert(sort.contains("rangepartitioning"), s"no range partitioning:\n$sort")
    assert(sort.contains("Sort"), s"no sort operator:\n$sort")
    val topk = plan("q_topk")
    assert(topk.contains("TakeOrderedAndProject"),
      s"top-k fell back to a global sort:\n$topk")
  }

  test("ivfAssign is a per-row argmax: zero Exchange, zero join") {
    import graft.operators.VectorOps
    val emb = Tables.load(spark, sf, "embeddings")
    val cents = VectorOps.trainCentroids(emb, "vec_id", "embedding", 4,
      iters = 1, sampleMax = 64)
    val p = VectorOps.ivfAssign(emb, "vec_id", "embedding", cents)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), s"assignment shuffles:\n$p")
    assert(!p.contains("Join"), s"assignment joins:\n$p")
  }

  test("tx_pii is a pure projection: zero Exchange") {
    val p = plan("tx_pii")
    assert(!p.contains("Exchange"), s"pii scrub shuffles:\n$p")
  }

  test("sampling/split/funnel queries: one partial-agg shuffle, no sort") {
    Seq("q_hash_sample", "q_split_assign", "tx_quality_funnel").foreach { q =>
      val p = plan(q)
      assert(raw"\(\d+\) Exchange".r.findAllIn(p).size == 1,
        s"$q expected exactly 1 exchange:\n$p")
      // map-side partial aggregation before the shuffle
      assert(raw"HashAggregate".r.findAllIn(p).size >= 2, s"$q no partial agg:\n$p")
      assert(!p.contains("(1) Sort") && !p.contains("GlobalSort"),
        s"$q sorts:\n$p")
    }
  }

  test("tx_pack_chunks windows per shard: exchange on source, no global sort") {
    val p = plan("tx_pack_chunks")
    // the packing window hash-partitions on the shard key — parallel
    // packing, never a single-partition global sort
    assert(p.contains("hashpartitioning(source"), s"not sharded on source:\n$p")
    assert(!p.contains("SinglePartition"), s"serializes through one partition:\n$p")
  }

  test("ts_autocorr: the lag window and the aggregate share ONE key shuffle") {
    val p = plan("ts_autocorr")
    assert(raw"\(\d+\) Exchange".r.findAllIn(p).size == 1,
      s"ts_autocorr expected exactly 1 exchange:\n$p")
    assert(p.contains("hashpartitioning(event_type"),
      s"ts_autocorr not keyed on event_type:\n$p")
    assert(!p.contains("SinglePartition"), s"ts_autocorr serializes:\n$p")
  }

  test("pl_topp_select: two-level rank/prefix-sum, broadcast-only joins") {
    // round-11 rewrite: the old single lang-keyed shuffle held only ~5
    // window partitions at any corpus size; the two-level rendering
    // buckets by -score and joins the metadata-scale offsets/lang
    // totals back as broadcasts — more exchanges, none of them a
    // fixed-cardinality straggler sort
    val p = plan("pl_topp_select")
    assert(!p.contains("SinglePartition"), s"pl_topp_select serializes:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"only broadcast (metadata-scale) joins allowed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"offsets must broadcast:\n$p")
  }

  test("dd_containment: density dispatch picks a keyed join, never a cartesian") {
    val p = plan("dd_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"containment degenerated to a cross join:\n$p")
    // dense corpora take the count-join (strict gram equality riding the
    // xxhash64 leading key); Zipf corpora take the prefix path verified
    // row-local by array_intersect; a small measured vocabulary (this
    // fixture) takes the bitmap popcount kernel (FlatMapGroups, no join)
    assert(p.contains("xxhash64") || p.contains("array_intersect") ||
      p.contains("MapGroups"),
      s"no containment path recognized:\n$p")
  }
}
