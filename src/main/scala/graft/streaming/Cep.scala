package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

final case class SeqEvent(key: String, kind: String, ts: Long)
final case class SeqMatch(key: String, sTs: Long, cTs: Long, pTs: Long)
final case class EnrichEvent(key: String, kind: String, ts: Long, id: Long)
final case class EnrichMatch(key: String, queryId: Long, matchId: Long)

/** Streaming 3-step sequence matcher — the continuous twin of the batch
  * `q_sequence_match` board row (CEP shape: first A, then the first B
  * within `stepMillis`, then the first C within `stepMillis` of that B).
  * Keyed state carries only the two anchor timestamps (16 bytes/key), so
  * a million concurrent keys is nothing; a completed match emits and
  * resets the key's machine so the next A starts a fresh sequence.
  * State is advanced in (ts, kind) order WITHIN each micro-batch; like
  * [[asOfEnrich]], batch-equality with the oracle additionally requires
  * EVENT-TIME-ORDERED batches (a later batch delivering an earlier A
  * cannot retract an anchor already latched — within-batch sorting
  * cannot undo cross-batch disorder; the replay harness chunks by
  * ascending event time for exactly this reason, and the round-13
  * review pinned the precondition here instead of leaving the old
  * unconditional determinism claim). Event timestamps must be
  * non-negative epoch millis: -1 is the empty-anchor sentinel, so a
  * pre-1970 ts would read as "no anchor" and silently never match —
  * refused per event.
  *
  * The reference's trigger plane reacts to single-value threshold
  * crossings (`RealVal` triggered cmds); multi-step temporal patterns
  * are the north-star generalization a Spark engine gets from keyed
  * state in one function.
  */
object Cep {

  implicit private val evEnc: Encoder[SeqEvent] = Encoders.product[SeqEvent]
  implicit private val mEnc: Encoder[SeqMatch] = Encoders.product[SeqMatch]
  implicit private val eeEnc: Encoder[EnrichEvent] = Encoders.product[EnrichEvent]
  implicit private val emEnc: Encoder[EnrichMatch] = Encoders.product[EnrichMatch]
  implicit private val stEnc: Encoder[(Long, Long)] = Encoders.product[(Long, Long)]
  implicit private val keyEnc: Encoder[String] = Encoders.STRING

  def sequenceMatches(events: Dataset[SeqEvent],
      first: String, second: String, third: String,
      stepMillis: Long): Dataset[SeqMatch] =
    events.groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long), SeqMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) { (key, it, state) =>
        var (sTs, cTs) = state.getOption.getOrElse((-1L, -1L))
        val out = scala.collection.mutable.ArrayBuffer.empty[SeqMatch]
        it.toSeq.sortBy(e => (e.ts, e.kind)).foreach { e =>
          // -1 is the empty-anchor sentinel: a negative ts would read as
          // "no A seen" and the key would silently never match
          require(e.ts >= 0,
            s"sequenceMatches: negative event ts ${e.ts} for key $key")
          if (e.kind == first) {
            if (sTs < 0) sTs = e.ts
          } else if (e.kind == second) {
            if (sTs >= 0 && cTs < 0 && e.ts > sTs && e.ts <= sTs + stepMillis)
              cTs = e.ts
          } else if (e.kind == third) {
            if (cTs >= 0 && e.ts > cTs && e.ts <= cTs + stepMillis) {
              out += SeqMatch(key, sTs, cTs, e.ts)
              sTs = -1L
              cTs = -1L
            }
          }
        }
        state.update((sTs, cTs))
        out.iterator
      }

  /** Streaming as-of enrichment — the continuous twin of the batch as-of
    * join (`j_asof` / the native `AsOfJoinExec`): keyed state carries the
    * latest dimension row (16 bytes/key: ts + id), and every query-kind
    * event emits immediately with whatever the state held when it was
    * processed. Events are advanced in (ts, dim-before-query, id) order
    * within each micro-batch: dims at ts T are visible to queries at the
    * SAME T, matching the oracle's inclusive `p.ts >= e.ts` and
    * AsOfJoinExec's `rt <= t` merge (plain (ts, id) order would make a
    * same-ts dim's visibility depend on how the ids happen to compare),
    * and among equal-ts dims the largest id overwrites last and wins —
    * the exec's ties-to-largest-(time, id) rule exactly. Given
    * time-ordered batches the emitted set is then EXACTLY the
    * ASOF LEFT JOIN result (matchId -1 = no prior dimension row = the
    * batch join's null). This is the stream-enrich shape every fleet
    * runs: readings against the latest calibration, purchases against
    * the latest error, ticks against the latest quote.
    */
  def asOfEnrich(events: Dataset[EnrichEvent],
      dimKind: String, queryKind: String): Dataset[EnrichMatch] =
    events.groupByKey(_.key)
      .flatMapGroupsWithState[(Long, Long), EnrichMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) { (key, it, state) =>
        var (lastTs, lastId) = state.getOption.getOrElse((-1L, -1L))
        val out = scala.collection.mutable.ArrayBuffer.empty[EnrichMatch]
        it.toSeq.sortBy(e =>
          (e.ts, if (e.kind == dimKind) 0 else 1, e.id)).foreach { e =>
          // -1 is the no-prior-dim sentinel (the batch join's null): a
          // negative dim id would be reported as a MISS on every later
          // query; a negative ts breaks the state guard below
          require(e.ts >= 0 && (e.kind != dimKind || e.id >= 0),
            s"asOfEnrich: negative ts/dim-id (${e.ts}, ${e.id}) for key $key")
          if (e.kind == dimKind) {
            // ties-to-largest-(ts, id) must hold ACROSS batches too: the
            // within-batch sort cannot see a prior batch's equal-ts dim,
            // so an unconditional overwrite let a later batch's SMALLER
            // id win (round-13 review; lastTs was stored in state for
            // exactly this guard but never read)
            if (e.ts > lastTs || (e.ts == lastTs && e.id > lastId)) {
              lastTs = e.ts; lastId = e.id
            }
          } else if (e.kind == queryKind) out += EnrichMatch(key, e.id, lastId)
        }
        state.update((lastTs, lastId))
        out.iterator
      }
}
