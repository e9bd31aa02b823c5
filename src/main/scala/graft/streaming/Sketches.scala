package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

final case class HeavyHitter(shard: Int, item: String, est: Long, err: Long)

final case class SsState(entries: List[(String, Long, Long)])

final case class NovelItem(shard: Int, item: String, novel: Boolean)

final case class BloomState(bits: Array[Byte])

/** Continuous heavy hitters with BOUNDED memory — the streaming twin of
  * the batch `tx_topk_ngrams` two-phase top-k. Each shard keeps a
  * Space-Saving summary (Metwally et al., public algorithm) of at most
  * `capacity` counters in keyed state: a new item evicts the current
  * minimum and inherits its count as error bound, so for every reported
  * item `est >= true_count >= est - err` and any item with true count
  * above N/capacity is guaranteed present. Per-batch each shard emits
  * its current top-k; a global top-k is one tiny aggregation over
  * shards × k rows. State is O(shards × capacity) regardless of stream
  * length — a billion-token stream costs the same memory as a million.
  */
object Sketches {

  implicit private val hhEnc: Encoder[HeavyHitter] = Encoders.product[HeavyHitter]
  implicit private val stEnc: Encoder[SsState] = Encoders.product[SsState]
  implicit private val keyEnc: Encoder[Int] = Encoders.scalaInt
  implicit private val itemEnc: Encoder[(Int, String)] =
    Encoders.product[(Int, String)]

  def spaceSavingTopK(items: Dataset[String], shards: Int, capacity: Int,
      k: Int): Dataset[HeavyHitter] = {
    val sharded = items.map(w => (math.floorMod(w.hashCode, shards), w))
    sharded.groupByKey(_._1)
      .flatMapGroupsWithState[SsState, HeavyHitter](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) { (shard, it, state) =>
        // (item -> (count, err)); rebuilt from the persisted list per batch
        val m = scala.collection.mutable.LinkedHashMap[String, (Long, Long)](
          state.getOption.map(_.entries).getOrElse(Nil)
            .map(t => t._1 -> (t._2, t._3)): _*)
        it.foreach { case (_, w) =>
          m.get(w) match {
            case Some((c, e)) => m.update(w, (c + 1, e))
            case None if m.size < capacity => m.update(w, (1L, 0L))
            case None =>
              val (wMin, (cMin, _)) = m.minBy(_._2._1)
              m.remove(wMin)
              m.update(w, (cMin + 1, cMin)) // inherits the evicted count as error
          }
        }
        state.update(SsState(m.toList.map { case (w, (c, e)) => (w, c, e) }))
        m.toSeq.sortBy { case (w, (c, _)) => (-c, w) }.take(k).iterator
          .map { case (w, (c, e)) => HeavyHitter(shard, w, c, e) }
      }
  }

  implicit private val niEnc: Encoder[NovelItem] = Encoders.product[NovelItem]
  implicit private val bsEnc: Encoder[BloomState] = Encoders.product[BloomState]

  /** Continuous novelty flags with BOUNDED memory — the streaming twin of
    * the batch `tx_novelty` first-seen join. Each shard keeps one Bloom
    * filter of `nBits` bits in keyed state; an arriving item is flagged
    * novel iff any of its `nHashes` double-hashed probe bits was unset,
    * then inserted. State is O(shards × nBits/8) bytes forever — a
    * billion-document stream costs the same memory as a thousand. The
    * one-sided error is the Bloom guarantee: a true duplicate is NEVER
    * flagged novel; a novel item is missed with probability ≈
    * (1 - e^(-kn/m))^k, so size m ≈ 10 bits per expected distinct item
    * for <1% misses at k=4. Probes use double hashing h1 + i·h2
    * (Kirsch–Mitzenmacher, public result) so k probes cost two hashes.
    */
  def bloomNovelty(items: Dataset[String], shards: Int, nBits: Int,
      nHashes: Int): Dataset[NovelItem] = {
    val sharded = items.map(w => (math.floorMod(w.hashCode, shards), w))
    sharded.groupByKey(_._1)
      .flatMapGroupsWithState[BloomState, NovelItem](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) { (shard, it, state) =>
        val bits = state.getOption.map(_.bits.clone())
          .getOrElse(new Array[Byte]((nBits + 7) / 8))
        // returns whether ALL probe bits were already set (seen before),
        // setting them as it goes
        def checkAndSet(w: String): Boolean = {
          val h1 = scala.util.hashing.MurmurHash3.stringHash(w, 0x9747b28c)
          val h2 = scala.util.hashing.MurmurHash3.stringHash(w, 0x85ebca6b) | 1
          var all = true
          var i = 0
          while (i < nHashes) {
            val idx = math.floorMod(h1 + i * h2, nBits)
            val mask = (1 << (idx & 7)).toByte
            if ((bits(idx >> 3) & mask) == 0) {
              all = false
              bits(idx >> 3) = (bits(idx >> 3) | mask).toByte
            }
            i += 1
          }
          all
        }
        // materialize before state.update — the iterator is lazy and the
        // state write must see every insertion
        val out = it.map { case (_, w) => NovelItem(shard, w, !checkAndSet(w)) }
          .toList
        state.update(BloomState(bits))
        out.iterator
      }
  }
}
