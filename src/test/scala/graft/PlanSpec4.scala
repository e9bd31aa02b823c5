package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-8 continuation rows: each query's Scaladoc
  * makes a scale claim (scan-only scoring, bounded shuffles, banded
  * never-all-pairs joins); these tests keep the physical plans honest.
  */
class PlanSpec4 extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  private def exchanges(p: String): Int = raw"\(\d+\) Exchange".r.findAllIn(p).size

  test("ann_adc: codes scan + top-k window, no joins at all") {
    val p = plan("ann_adc")
    assert(!p.contains("Join"), s"ADC must not join:\n$p")
    // one Exchange for the per-query top-k window
    assert(exchanges(p) == 1, s"expected exactly 1 exchange:\n$p")
  }

  test("ann_ivfpq: probed-cell filter is row-local, no joins") {
    val p = plan("ann_ivfpq")
    assert(!p.contains("Join"), s"IVF-PQ scan must not join:\n$p")
    assert(exchanges(p) == 1, s"expected exactly 1 exchange (top-k):\n$p")
  }

  test("pl_pack: two-level prefix sum, broadcast-only joins, no single-partition sort") {
    // round-11 rewrite: the old per-lang running-sum window held only ~5
    // window partitions at any corpus size; the two-level rendering's
    // within-bucket windows are data-scaled and the offsets table joins
    // back as a broadcast
    val p = plan("pl_pack")
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition sort crept in:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"only broadcast (metadata-scale) joins allowed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"offsets must broadcast:\n$p")
  }

  test("mm_ahash_pairs: banded hash join, never a cross product") {
    val p = plan("mm_ahash_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banded join degenerated:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equi-join found:\n$p")
  }

  test("ts_cross_corr: events aggregate once; lag table broadcast") {
    val p = plan("ts_cross_corr")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"lag table not broadcast:\n$p")
    // hourly agg (1 exchange) + tiny joined agg exchanges; never a
    // per-event join explosion
    assert(!p.contains("CartesianProduct"), s"cross product crept in:\n$p")
  }

  test("v_pq training pass: one bounded (s, code, dim) aggregation shuffle") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DecimalType
    import graft.operators.VectorOps
    val e = Tables.load(spark, sf, "embeddings")
    // the per-iteration stats job inside pqState: rebuild its frame shape
    val (cb, _) = VectorOps.pqState(e, "vec_id", "embedding", 8, 4, 1)
    val v = transform(col("embedding"), x => x.cast("double"))
    val subCols = (0 until 8).map { s =>
      val sv = slice(v, s * 8 + 1, 8)
      struct(lit(s).as("s"),
        element_at(sort_array(array((0 until 4).map(c =>
          struct(lit(0.0).as("d"), lit(c).as("c"))): _*)), 1).getField("c").as("code"),
        sv.as("sv"))
    }
    val stats = e.select(explode(array(subCols: _*)).as("t"))
      .select(col("t.s"), col("t.code"), posexplode(col("t.sv")).as(Seq("p", "x")))
      .groupBy(col("s"), col("code"), (col("p") + 1).as("dim"))
      .agg(sum(col("x").cast(DecimalType(28, 8))).as("mv"))
    val p = stats.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"), s"training pass must not join:\n$p")
    assert(exchanges(p) == 1, s"expected exactly 1 exchange:\n$p")
    assert(cb.length == 8 && cb(0).length == 4)
  }

  test("dd_snm: windows are block-partitioned, never a global sort") {
    val p = plan("dd_snm")
    assert(!p.contains("SinglePartition"),
      s"SNM must not collapse to one partition:\n$p")
    assert(p.contains("hashpartitioning"), s"expected partitioned windows:\n$p")
  }

  test("pl_epoch_shuffle: no per-shard list materialization") {
    val p = plan("pl_epoch_shuffle")
    assert(!p.contains("collect_list"),
      s"permutation checksum must not gather a shard into one list:\n$p")
    assert(!p.contains("SinglePartition"), s"no global window allowed:\n$p")
  }

  test("tx_inverted_index: salted local top-k precedes the per-term rank") {
    val p = plan("tx_inverted_index")
    // the (term, salt) local rank and the term rank, each with Spark's
    // WindowGroupLimit pushdown (the rn <= 16 filter prunes DURING the
    // sort, so a hot term's surplus postings never materialize)
    val windows = raw"\(\d+\) Window".r.findAllIn(p).size
    assert(windows >= 2, s"expected salted + global rank windows:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"rank limit not pushed into the window sort:\n$p")
    assert(!p.contains("SinglePartition"), s"no single-partition sort:\n$p")
  }

  test("mm_scene_cut: row-local codec round-trip, zero exchanges") {
    val p = plan("mm_scene_cut")
    assert(!p.contains("Join") && exchanges(p) == 0,
      s"scene-cut must be one scan:\n$p")
  }

  test("ts_m4: pure aggregation — no window, no join on the series scan") {
    val p = plan("ts_m4")
    assert(!p.contains(") Window"), s"M4 must not use a window:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"M4 must not shuffle-join the series:\n$p")
  }

  test("tx_cdc_chunks: boundary id and chunk start share ONE doc sort-shuffle") {
    val p = plan("tx_cdc_chunks")
    // Spark renders the two running aggregates as two Window nodes, but
    // they must ride a single Exchange+Sort on doc_id (and the chunk
    // group-by reuses that distribution — no second shuffle before it)
    val sorts = raw"\(\d+\) Sort".r.findAllIn(p).size
    assert(sorts == 1, s"expected one sort for both running windows:\n$p")
    assert(!p.contains("SinglePartition"), s"no global window allowed:\n$p")
  }

  test("tx_html_extract: row-local extraction, zero exchanges") {
    val p = plan("tx_html_extract")
    assert(!p.contains("Join") && exchanges(p) == 0,
      s"extraction must be one scan:\n$p")
  }

  test("q_key_skew: aggregate-only skew profile, no window or sort-join") {
    val p = plan("q_key_skew")
    assert(!p.contains(") Window"), s"HHI must not sort an ECDF:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"profile must not join:\n$p")
  }

  test("mm_vad: codec flatMap + doc-partitioned segmentation windows") {
    val p = plan("mm_vad")
    assert(!p.contains("SinglePartition"),
      s"segmentation must stay doc-partitioned:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cross product:\n$p")
  }

  test("v_hard_negatives: corpus scanned once against a broadcast query side") {
    val p = plan("v_hard_negatives")
    assert(p.contains("Broadcast"), s"query side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"mining must not shuffle-join the corpus:\n$p")
  }

  test("v_bfs_hops: frontier joins never degenerate to a cross product") {
    val p = plan("v_bfs_hops")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"BFS round degenerated:\n$p")
  }

  test("q_approx_cms: sketch audit joins broadcast, never shuffle-join the vocab") {
    val p = plan("q_approx_cms")
    assert(p.contains("BroadcastHashJoin"), s"audit joins must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"CMS audit degenerated:\n$p")
  }

  test("mm_mp4_probe: row-local container walk, zero exchanges") {
    val p = plan("mm_mp4_probe")
    assert(!p.contains("Join") && exchanges(p) == 0,
      s"probe must be one scan:\n$p")
  }

  test("v_random_walk: per-step node-key joins, no cross product") {
    val p = plan("v_random_walk")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"walk step degenerated:\n$p")
  }

  test("tx_bpe_merges pair count: one vocab-sized aggregation exchange") {
    import org.apache.spark.sql.functions._
    import graft.operators.TextOps
    val docs = Tables.load(spark, sf, "documents")
    val words = docs
      .select(explode(TextOps.tokens(col("text"))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
    val syms = filter(split(col("w"), ""), x => x =!= "")
    val pairs = words
      .select(col("wc"), syms.as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("wc"),
        explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("a"),
            element_at(col("syms"), i + 1).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("wc").as("cnt"))
    val p = pairs.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!p.contains("Join"), s"pair counting must not join:\n$p")
    // word-count exchange + pair-count exchange, both map-side combined
    assert(exchanges(p) == 2, s"expected exactly 2 exchanges:\n$p")
    assert(p.contains("partial"), s"expected map-side partial agg:\n$p")
  }
}
