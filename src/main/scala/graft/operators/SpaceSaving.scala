package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** Batch mergeable heavy-hitters summary — the bounded-memory
  * approximate top-k for columns whose exact distinct space doesn't fit
  * anywhere (the 100 TB twin of the exact two-phase `tx_topk_ngrams`,
  * and the batch twin of the streaming `Sketches.spaceSavingTopK`).
  *
  * Per-partition Misra–Gries with `capacity` counters, merged pairwise
  * with the Agarwal et al. "Mergeable Summaries" (PODS'12, public
  * result) combine step: sum counts, then subtract the (capacity+1)-th
  * largest count from every item and drop the non-positives. The merged
  * summary keeps the MG guarantee over the WHOLE input: for every item
  * `est <= true_count <= est + N/(capacity+1)`, and any item with
  * true count above `N/(capacity+1)` is guaranteed present
  * (`q_approx_topk_bounds` gates both properties against exact counts).
  *
  * Scale shape: `treeAggregate` — per-partition imperative fold (the one
  * place an RDD beats a DataFrame: a shared mutable map across rows of a
  * partition), then a log-depth merge tree of capacity-bounded maps. No
  * shuffle of the raw items, no driver collect of anything larger than
  * one summary: a 1000-executor scan ships 1000 maps of `capacity`
  * entries through the tree.
  */
object SpaceSaving {

  /** Merged Misra–Gries summary of `items`: (item, est) pairs,
    * `capacity` at most.
    */
  def summarize(items: Dataset[String], capacity: Int): Map[String, Long] = {
    require(capacity > 0)
    // the per-partition fold really IS the shared mutable map the
    // scaladoc promises (round-13 review: the old fold threaded an
    // IMMUTABLE Map, rebuilding all `capacity` entries on every
    // decrement-all — O(N·capacity) allocations on a high-cardinality
    // partition, precisely the overhead the treeAggregate shape was
    // advertised to avoid). treeAggregate deserializes the zero value
    // fresh per partition, so in-place mutation is safe. The combine
    // side keeps the spec-pinned immutable [[mgMerge]] — it runs once
    // per tree edge over capacity-bounded maps, where allocation cost
    // is irrelevant and one shared implementation beats two.
    type MMap = scala.collection.mutable.HashMap[String, Long]
    val seqOp = (m: MMap, w: String) => {
      m.get(w) match {
        case Some(c) => m.update(w, c + 1)
        case None if m.size < capacity => m.update(w, 1L)
        case None =>
          // decrement-all: every counter pays one, zeros drop out
          m.mapValuesInPlace((_, c) => c - 1)
          m.filterInPlace((_, c) => c > 0)
      }
      m
    }
    val combOp = (a: MMap, b: MMap) =>
      scala.collection.mutable.HashMap.from(
        mgMerge(a.toMap, b.toMap, capacity))
    items.rdd.treeAggregate(new MMap)(seqOp, combOp).toMap
  }

  private[graft] def mgMerge(a: Map[String, Long], b: Map[String, Long],
      capacity: Int): Map[String, Long] = {
    val sum = b.foldLeft(a) { case (m, (k, c)) =>
      m.updated(k, m.getOrElse(k, 0L) + c)
    }
    if (sum.size <= capacity) sum
    else {
      // subtract the (capacity+1)-th largest count, drop non-positives
      val d = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
      sum.flatMap { case (k, c) => if (c > d) Some(k -> (c - d)) else None }
    }
  }

  /** The summary as a one-column-per-field DataFrame (item, est),
    * deterministically ordered (est desc, item) and truncated to `topK`.
    */
  def topK(items: Dataset[String], capacity: Int, topK: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    summarize(items, capacity).toSeq
      .sortBy { case (w, c) => (-c, w) }
      .take(topK)
      .toDF("item", "est")
  }
}
