package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The rtvals state plane (SURVEY.md §1.1 rtvals, §2.7-2.8) as Structured
  * Streaming state: one keyed state row per Val, updated per micro-batch
  * with last/min/max/count plus Welford running mean/variance — the
  * streaming twin of the batch st_* queries.
  *
  * Reference semantics: RealVal update pipeline
  * `/root/reference/src/util/data/RealVal.java:145-182` (last/min/max),
  * `:385-414` (avg/stdev), triggered commands with hysteresis `:464-533`.
  */
final case class ValUpdate(key: String, value: Double, ts: Long)

final case class ValState(
    last: Double, min: Double, max: Double, count: Long,
    mean: Double, m2: Double, lastTs: Long, active: Boolean)

final case class ValSnapshot(
    key: String, last: Double, min: Double, max: Double,
    count: Long, avg: Double, stddev: Option[Double], lastTs: Long)

/** kind: "rising" (crossed high with hysteresis) | "cleared" | "changed". */
final case class ValAlert(key: String, kind: String, value: Double, ts: Long)

/** Snapshot carrying the aggregation epoch (increments on group reset). */
final case class EpochSnapshot(
    key: String, epoch: Long, last: Double, min: Double, max: Double,
    count: Long, avg: Double, lastTs: Long)

/** Internal: ValUpdate + the watermarked event-time column. */
final case class TsUpdate(key: String, value: Double, ts: Long, ets: java.sql.Timestamp)

/** Typed Val update (SURVEY §1.2): kind in real|int|text|flag. Numeric
  * kinds carry `num`; text/flag carry `text` (flags parse the dcafs
  * truthy strings).
  */
final case class TypedUpdate(key: String, kind: String, num: Double, text: String, ts: Long)

final case class EwmaSnapshot(key: String, ewma: Double, count: Long, lastTs: Long)

final case class TypedSnapshot(
    key: String, kind: String,
    lastNum: Option[Double], lastText: Option[String], lastFlag: Option[Boolean],
    min: Option[Double], max: Option[Double], count: Long, lastTs: Long)

object RtVals {

  implicit private val updEnc: Encoder[ValUpdate] = Encoders.product[ValUpdate]
  implicit private val snapEnc: Encoder[ValSnapshot] = Encoders.product[ValSnapshot]
  implicit private val alertEnc: Encoder[ValAlert] = Encoders.product[ValAlert]
  implicit private val stateEnc: Encoder[ValState] = Encoders.product[ValState]
  implicit private val keyEnc: Encoder[String] = Encoders.STRING

  private def fold(st: ValState, v: ValUpdate): ValState =
    // a NaN value (sensor glitch) must not poison the running stats:
    // min/max/mean/m2 would all become NaN with NO reset path under
    // NoTimeout, and every later snapshot for the key would report NaN
    // forever (round-13 review — the same slot-theft class as madGate).
    // A NaN update still proves LIVENESS (lastTs advances, so idle
    // timeouts re-arm) but contributes nothing else; `last` keeps the
    // last real reading, count counts real samples (consistent with
    // mean/m2), and alerts never compare against a NaN.
    if (v.value.isNaN) st.copy(lastTs = math.max(st.lastTs, v.ts))
    else {
      val n = st.count + 1
      val d = v.value - st.mean
      val mean = st.mean + d / n
      val m2 = st.m2 + d * (v.value - mean)
      ValState(
        last = v.value,
        min = math.min(st.min, v.value),
        max = math.max(st.max, v.value),
        count = n, mean = mean, m2 = m2,
        lastTs = math.max(st.lastTs, v.ts),
        active = st.active)
    }

  private val empty = ValState(
    last = Double.NaN, min = Double.PositiveInfinity,
    max = Double.NegativeInfinity, count = 0L,
    mean = 0.0, m2 = 0.0, lastTs = Long.MinValue, active = false)

  private def snapshot(key: String, st: ValState): ValSnapshot =
    ValSnapshot(key, st.last, st.min, st.max, st.count,
      st.mean,
      if (st.count > 1) Some(math.sqrt(st.m2 / (st.count - 1))) else None,
      st.lastTs)

  /** Current state per key, re-emitted on every batch that touches the key
    * (Update output mode). The in-memory rtvals listing becomes
    * `SELECT * FROM <queryName>` on the memory/console sink.
    */
  def snapshots(updates: Dataset[ValUpdate]): Dataset[ValSnapshot] =
    updates.groupByKey(_.key)
      .mapGroupsWithState[ValState, ValSnapshot](GroupStateTimeout.NoTimeout()) {
        (key, it, state: GroupState[ValState]) =>
          val st0 = state.getOption.getOrElse(empty)
          val st = it.toSeq.sortBy(u => (u.ts, u.value)).foldLeft(st0)(fold)
          state.update(st)
          snapshot(key, st)
      }

  /** Group reset (RealtimeValues.java:212-216,287-291): a reset starts a
    * new aggregation epoch — stats restart from empty, the epoch counter
    * increments, and the marker row itself belongs to (and is counted in)
    * the new epoch. Streaming twin of the batch `st_reset` oracle query.
    */
  def snapshotsWithReset(updates: Dataset[ValUpdate],
      isReset: ValUpdate => Boolean): Dataset[EpochSnapshot] =
    updates.groupByKey(_.key)
      .mapGroupsWithState[(Long, ValState), EpochSnapshot](
        GroupStateTimeout.NoTimeout()) { (key, it, state) =>
        var (epoch, st) = state.getOption.getOrElse((0L, empty))
        it.toSeq.sortBy(u => (u.ts, u.value)).foreach { u =>
          if (isReset(u)) { epoch += 1; st = empty }
          st = fold(st, u)
        }
        state.update((epoch, st))
        val s = snapshot(key, st)
        EpochSnapshot(key, epoch, s.last, s.min, s.max, s.count, s.avg, s.lastTs)
      }

  /** Continuous per-key EWMA — the streaming twin of the batch `ts_ewma`
    * board row, unbounded horizon because the running value lives in
    * keyed state: ewma_0 = x_0, ewma_n = (1-alpha)*ewma + alpha*x_n
    * (the smoothing the reference's MathFab users apply to sensor
    * series downstream). Re-emitted per touched key each batch.
    */
  def ewma(updates: Dataset[ValUpdate], alpha: Double): Dataset[EwmaSnapshot] =
    updates.groupByKey(_.key)
      .mapGroupsWithState[(Double, Long, Long), EwmaSnapshot](
        GroupStateTimeout.NoTimeout()) { (key, it, state) =>
        var (e, n, lastTs) = state.getOption.getOrElse((0.0, 0L, Long.MinValue))
        it.toSeq.sortBy(u => (u.ts, u.value)).foreach { u =>
          e = if (n == 0) u.value else (1 - alpha) * e + alpha * u.value
          n += 1
          lastTs = math.max(lastTs, u.ts)
        }
        state.update((e, n, lastTs))
        EwmaSnapshot(key, e, n, lastTs)
      }

  implicit private val ewmaSnapEnc: Encoder[EwmaSnapshot] = Encoders.product[EwmaSnapshot]
  implicit private val ewmaStEnc: Encoder[(Double, Long, Long)] =
    Encoders.product[(Double, Long, Long)]

  implicit private val epochSnapEnc: Encoder[EpochSnapshot] = Encoders.product[EpochSnapshot]
  implicit private val epochStEnc: Encoder[(Long, ValState)] =
    Encoders.product[(Long, ValState)]

  implicit private val typedUpdEnc: Encoder[TypedUpdate] = Encoders.product[TypedUpdate]
  implicit private val typedSnapEnc: Encoder[TypedSnapshot] = Encoders.product[TypedSnapshot]
  implicit private val typedStEnc: Encoder[(String, Double, String, Double, Double, Long, Long)] =
    Encoders.product[(String, Double, String, Double, Double, Long, Long)]

  private val truthy = Set("true", "1", "high", "yes", "on")

  /** Typed rtvals state: real/int keep last/min/max/count; text keeps the
    * last string; flag parses dcafs truthy strings (FlagVal semantics).
    * The four concurrent maps of RealtimeValues.java:29-32 become one
    * keyed state stream with a kind column.
    */
  def typedSnapshots(updates: Dataset[TypedUpdate]): Dataset[TypedSnapshot] =
    updates.groupByKey(_.key)
      .mapGroupsWithState[(String, Double, String, Double, Double, Long, Long), TypedSnapshot](
        GroupStateTimeout.NoTimeout()) { (key, it, state) =>
        var (kind, lastNum, lastText, mn, mx, n, lastTs) =
          state.getOption.getOrElse(("", Double.NaN, "",
            Double.PositiveInfinity, Double.NegativeInfinity, 0L, Long.MinValue))
        // total-order tie-break like every sibling machine (snapshots/
        // ewma sort (ts, value); Cep sorts (ts, kind)/(ts, id)): ts
        // alone would leave same-timestamp updates in shuffle order, so
        // lastText/lastFlag could differ between a replay and its rerun
        // (or a speculative duplicate attempt). doubleToLongBits gives
        // num a deterministic order with one canonical NaN. text is
        // nullable through the DataFrame boundary (Encoders.product
        // permits null Strings) — normalize to "" before the ordering
        // and the flag parse dereference it (round-13 review: a null
        // text NPE'd the micro-batch).
        def txt(u: TypedUpdate): String = if (u.text == null) "" else u.text
        it.toSeq.sortBy(u => (u.ts, u.kind, txt(u),
          java.lang.Double.doubleToLongBits(u.num))).foreach { u =>
          kind = u.kind
          u.kind match {
            case "real" | "int" =>
              // NaN glitch: liveness only, never the stats (see fold)
              if (!u.num.isNaN) {
                lastNum = u.num
                mn = math.min(mn, u.num); mx = math.max(mx, u.num)
              }
            case "flag" =>
              lastNum = if (truthy(txt(u).trim.toLowerCase)) 1.0 else 0.0
              lastText = txt(u)
            case _ => lastText = txt(u)
          }
          n += 1
          lastTs = math.max(lastTs, u.ts)
        }
        state.update((kind, lastNum, lastText, mn, mx, n, lastTs))
        val numeric = kind == "real" || kind == "int"
        TypedSnapshot(key, kind,
          if (numeric || kind == "flag") Some(lastNum) else None,
          if (!numeric) Some(lastText) else None,
          if (kind == "flag") Some(lastNum > 0.5) else None,
          if (numeric) Some(mn) else None,
          if (numeric) Some(mx) else None,
          n, lastTs)
      }

  /** Stream TTL / idle detection (SURVEY §2.8: BaseStream.java:97-103):
    * when a key sees no data for `ttl` in EVENT time, emit an `idle`
    * alert; the first update after an idle period emits `!idle`
    * (recovery). Event-time timeouts ride the watermark, so replays of
    * recorded streams produce identical alerts.
    *
    * `watermarkDelay` is Spark's late-row bound, and it applies BEFORE
    * the state machine: any update more than `watermarkDelay` behind the
    * stream's max event time is silently dropped by the engine, so an
    * "idle" alert can fire for a key whose late data was discarded. The
    * "0 seconds" default is correct ONLY for event-time-ordered streams
    * (the replay harness's chunking); a disordered production feed must
    * pass a delay covering its skew (round-13 review: the implication
    * was undocumented).
    */
  implicit private val tsUpdEnc: Encoder[TsUpdate] = Encoders.product[TsUpdate]

  def idleAlerts(updates: Dataset[ValUpdate], ttlMillis: Long,
      watermarkDelay: String = "0 seconds"): Dataset[ValAlert] = {
    // ttl = 0 would re-emit "idle" on every watermark advance
    require(ttlMillis > 0, s"idleAlerts: ttlMillis must be > 0, got $ttlMillis")
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    updates.toDF()
      .withColumn("ets", timestamp_millis(col("ts")))
      .withWatermark("ets", watermarkDelay)
      .as[TsUpdate] // the watermarked column must reach the grouped input
      .groupByKey(_.key)
      .flatMapGroupsWithState[ValState, ValAlert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key, it, state: GroupState[ValState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[ValAlert]
          if (state.hasTimedOut) {
            val st = state.get
            out += ValAlert(key, "idle", st.last, st.lastTs + ttlMillis)
            state.update(st.copy(active = true)) // active marks "currently idle"
          } else {
            var st = state.getOption.getOrElse(empty)
            val sorted = it.map(u => ValUpdate(u.key, u.value, u.ts))
              .toSeq.sortBy(u => (u.ts, u.value))
            if (sorted.nonEmpty) {
              if (st.active) // was idle, data arrived: recovery trigger
                out += ValAlert(key, "!idle", sorted.head.value, sorted.head.ts)
              st = sorted.foldLeft(st.copy(active = false))(fold)
              state.update(st)
              state.setTimeoutTimestamp(st.lastTs + ttlMillis)
            }
          }
          out.iterator
      }
  }

  /** Alert stream with dcafs trigger semantics: `rising` fires once when
    * the value reaches `high` and re-arms only after it clears `low`
    * (hysteresis); `changed` fires whenever the value differs from the
    * previous one.
    */
  def alerts(updates: Dataset[ValUpdate], high: Double, low: Double,
      emitChanged: Boolean = false): Dataset[ValAlert] =
    updates.groupByKey(_.key)
      .flatMapGroupsWithState[ValState, ValAlert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key, it, state: GroupState[ValState]) =>
          var st = state.getOption.getOrElse(empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[ValAlert]
          it.toSeq.sortBy(u => (u.ts, u.value)).foreach { u =>
            // NaN glitches never trigger: NaN != last is always true and
            // would fire a spurious "changed" (fold already excludes NaN
            // from the stats; rising/cleared compares are false for NaN)
            if (emitChanged && st.count > 0 && !u.value.isNaN &&
                u.value != st.last)
              out += ValAlert(key, "changed", u.value, u.ts)
            if (!st.active && u.value >= high) {
              out += ValAlert(key, "rising", u.value, u.ts)
              st = fold(st, u).copy(active = true)
            } else if (st.active && u.value <= low) {
              out += ValAlert(key, "cleared", u.value, u.ts)
              st = fold(st, u).copy(active = false)
            } else st = fold(st, u)
          }
          state.update(st)
          out.iterator
      }
}
