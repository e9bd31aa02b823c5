package graft.streaming

import java.time.{DayOfWeek, Instant, LocalTime, ZonedDateTime, ZoneId, ZoneOffset}
import java.util.concurrent.{Executors, ScheduledExecutorService, ScheduledFuture, TimeUnit}

/** The reference's task scheduling plane (SURVEY §2.8:
  * `/root/reference/src/util/task/Task.java:62-90` TRIGGERTYPE, `:100-135`
  * while/waitfor blocks, arming `TaskManager.java:356,842,201`): interval,
  * clock (time-of-day + days-of-week, UTC or local), keyword, delay,
  * while and waitfor triggers over guarded commands.
  *
  * Guards (`req`/`check`) are thunks so the wiring decides what state they
  * read — typically a closure over the latest rtvals snapshot, i.e. the
  * same guard surface RuleEngine evaluates in-stream. Dispatch receives
  * (taskId, command) — the OUTPUT plane (Task.java:69-71) is the caller's.
  */
sealed trait TaskTrigger
final case class Interval(periodMs: Long, initialDelayMs: Long = 0L) extends TaskTrigger
final case class Clock(time: LocalTime, days: Set[DayOfWeek] = Set.empty,
    utc: Boolean = true) extends TaskTrigger
final case class Keyword(word: String) extends TaskTrigger
final case class Delay(delayMs: Long) extends TaskTrigger
/** Run `cmd` every interval while the check holds (stops on first fail
  * or after maxChecks runs).
  */
final case class While(intervalMs: Long, maxChecks: Int) extends TaskTrigger
/** Poll every interval until the check holds (dispatch once), giving up
  * after maxChecks polls.
  */
final case class WaitFor(intervalMs: Long, maxChecks: Int) extends TaskTrigger

final case class ScheduledTask(id: String, trigger: TaskTrigger, cmd: String,
    req: () => Boolean = () => true)

object TaskScheduler {

  /** Millis until the next occurrence of `time` on an allowed day —
    * pure, so clock arming is testable without waiting for wall time
    * (TimeTools.java:585-610 semantics: empty day set = every day).
    */
  def nextClockDelayMs(time: LocalTime, days: Set[DayOfWeek], utc: Boolean,
      now: Instant, zone: ZoneId = ZoneId.systemDefault()): Long = {
    val z = if (utc) ZoneOffset.UTC else zone
    var cand = ZonedDateTime.ofInstant(now, z).`with`(time).withNano(0)
    if (!cand.toInstant.isAfter(now)) cand = cand.plusDays(1)
    while (days.nonEmpty && !days.contains(cand.getDayOfWeek))
      cand = cand.plusDays(1)
    // CEILING millis, not Duration.toMillis (which truncates): `now` has
    // sub-millisecond precision while the candidate is whole-second, so
    // truncation fired the tick up to ~1 ms EARLY — and the re-arm then
    // computed a 0 ms delay back to the SAME occurrence, dispatching the
    // task in a tight loop until wall time passed the target (round-13
    // review). Rounding up fires at-or-after the target, so the re-arm
    // always lands on the next day's occurrence.
    val d = java.time.Duration.between(now, cand.toInstant)
    d.toMillis + (if (d.getNano % 1000000 != 0) 1L else 0L)
  }
}

class TaskScheduler(
    dispatch: (String, String) => Unit,
    scheduler: ScheduledExecutorService = Executors.newSingleThreadScheduledExecutor(),
    now: () => Instant = () => Instant.now()) {

  import TaskScheduler._

  private val keywordTasks = new java.util.concurrent.ConcurrentHashMap[
    String, List[ScheduledTask]]()
  private val futures = new java.util.concurrent.ConcurrentLinkedQueue[ScheduledFuture[_]]()

  /** One scheduler tick, exception-contained: scheduleAtFixedRate
    * silently suppresses ALL future runs after a single thrown
    * exception, so one transient dispatch failure (a socket down for
    * one tick) would otherwise permanently and invisibly kill a
    * recurring task — and a throwing Clock tick would skip its re-arm,
    * ending the daily schedule forever. A failed tick is logged and the
    * task stays armed; the next tick retries.
    */
  private def tick(label: String)(body: => Unit): Unit =
    try body catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[tasks] task '$label' tick failed (kept armed): $e")
    }

  private def guarded(t: ScheduledTask): Unit =
    tick(t.id) { if (t.req()) dispatch(t.id, t.cmd) }

  /** Arm a task; returns this for chaining. */
  def add(t: ScheduledTask): TaskScheduler = {
    t.trigger match {
      case Interval(period, initial) =>
        futures.add(scheduler.scheduleAtFixedRate(
          () => guarded(t), initial, period, TimeUnit.MILLISECONDS))
      case Delay(d) =>
        futures.add(scheduler.schedule(
          (() => guarded(t)): Runnable, d, TimeUnit.MILLISECONDS))
      case c: Clock =>
        def arm(): Unit = {
          val d = nextClockDelayMs(c.time, c.days, c.utc, now())
          futures.add(scheduler.schedule((() => { guarded(t); arm() }): Runnable,
            d, TimeUnit.MILLISECONDS))
        }
        arm()
      case Keyword(word) =>
        keywordTasks.merge(word, List(t), (a, b) => a ++ b)
      case While(interval, maxChecks) =>
        val runs = new java.util.concurrent.atomic.AtomicInteger(0)
        val ref = new java.util.concurrent.atomic.AtomicReference[ScheduledFuture[_]]()
        // the runnable may fire before ref is set (initial delay 0): a
        // null ref skips the cancel this tick; the next tick retries
        val stopped = new java.util.concurrent.atomic.AtomicBoolean(false)
        ref.set(scheduler.scheduleAtFixedRate(() => tick(t.id) {
          if (!stopped.get()) {
            if (t.req() && runs.incrementAndGet() <= maxChecks) dispatch(t.id, t.cmd)
            else { stopped.set(true); Option(ref.get()).foreach(_.cancel(false)) }
          } else Option(ref.get()).foreach(_.cancel(false))
        }, 0, interval, TimeUnit.MILLISECONDS))
        futures.add(ref.get())
      case WaitFor(interval, maxChecks) =>
        val polls = new java.util.concurrent.atomic.AtomicInteger(0)
        val ref = new java.util.concurrent.atomic.AtomicReference[ScheduledFuture[_]]()
        val done = new java.util.concurrent.atomic.AtomicBoolean(false)
        ref.set(scheduler.scheduleAtFixedRate(() => tick(t.id) {
          if (!done.get()) {
            if (t.req()) { done.set(true); dispatch(t.id, t.cmd) }
            else if (polls.incrementAndGet() >= maxChecks) done.set(true)
          }
          if (done.get()) Option(ref.get()).foreach(_.cancel(false))
        }, 0, interval, TimeUnit.MILLISECONDS))
        futures.add(ref.get())
    }
    this
  }

  /** Fire keyword-triggered tasks (TaskManager.startKeywordTask,
    * `:201-210`) — e.g. wired to a filtered line stream via foreachBatch.
    */
  def fireKeyword(word: String): Unit =
    keywordTasks.getOrDefault(word, Nil).foreach(guarded)

  def shutdown(): Unit = {
    futures.forEach(f => f.cancel(false))
    scheduler.shutdownNow()
  }
}

/** Arms a parsed tasklist script (DcafsXml.parseTasks) and runs its
  * tasksets, bridging the reference's TaskManager execution model
  * (`TaskManager.java:257-299` startTaskset, `:375-392` oneshot start,
  * `:598-610` "taskset:id" chaining) onto [[TaskScheduler]]:
  *
  *  - single `<tasks>` entries with a trigger arm at construction;
  *  - tasksets start on demand via [[startSet]] or a dispatched
  *    `taskset:<id>` task value (the reference's chaining form);
  *  - `oneshot` sets plan every task at once (each honoring its own
  *    trigger); `step` sets run sequentially and stop at the first task
  *    whose guard fails;
  *  - `repeat` > 1 replays the set; `repeat` = -1 (infinite) is clamped
  *    to one pass — unbounded replay is the caller's loop to own.
  *
  * `send` receives (taskId, output, value) — the OUTPUT plane
  * (stream/system/log/email routing, Task.java:69-71) stays the caller's.
  * `compileReq` maps a `req` attribute onto a guard thunk, the same guard
  * surface RuleEngine evaluates.
  */
class TasklistRunner(
    tl: graft.DcafsXml.Tasklist,
    send: (String, String, String) => Unit,
    compileReq: String => () => Boolean = _ => () => true,
    scheduler: ScheduledExecutorService = Executors.newSingleThreadScheduledExecutor()) {

  import graft.DcafsXml.{TaskSetSpec, TaskSpec}

  private val sets: Map[String, TaskSetSpec] = tl.sets.map(s => s.id -> s).toMap
  private val outputs = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def dispatch(id: String, value: String): Unit =
    if (value.startsWith("taskset:")) startSet(value.stripPrefix("taskset:"))
    else send(id, outputs.getOrDefault(id, "system"), value)

  val tasks = new TaskScheduler(dispatch, scheduler)

  private def guard(t: TaskSpec): () => Boolean =
    t.req.map(compileReq).getOrElse(() => true)

  tl.tasks.foreach { t =>
    outputs.put(t.id, t.output)
    // triggerless single tasks only run when chained/linked — never at boot
    t.trigger.foreach(tr => tasks.add(ScheduledTask(t.id, tr, t.value, guard(t))))
  }

  def taskIds: Seq[String] = tl.tasks.map(_.id)
  def setIds: Seq[String] = tl.sets.map(_.id)
  def describeSets: Seq[String] =
    tl.sets.map(s => s"${s.id}\t${s.name}\trun=${s.run}\ttasks=${s.tasks.size}")

  def startSet(id: String): Boolean = sets.get(id) match {
    case None => false
    case Some(s) =>
      // replay passes run SEQUENTIALLY: a plain loop would launch every
      // pass at once whenever a task has a Delay trigger (the schedule
      // call returns immediately), interleaving t1,t1,t2,t2 across
      // passes instead of replaying t1,t2 then t1,t2. Step sets chain
      // the next pass through the step continuation (exact: pass N+1
      // starts after pass N's last task); oneshot sets schedule it
      // after the pass's Delay horizon (interval/clock arms are
      // persistent, not pass-scoped, so they don't gate replay).
      val totalPasses = math.max(s.repeat, 1)
      def oneshotPass(firstPass: Boolean): Long = {
        var horizonMs = 0L
        s.tasks.foreach { t =>
          outputs.put(t.id, t.output)
          t.trigger match {
            case Some(tr @ Delay(d)) =>
              // Delay arms are pass-scoped: re-armed per replay pass
              tasks.add(ScheduledTask(t.id, tr, t.value, guard(t)))
              horizonMs = math.max(horizonMs, d)
            case Some(tr) =>
              // Interval/Clock/Keyword/While/WaitFor arms are PERSISTENT
              // (the replay comment below already says so) — re-adding
              // them per pass armed DUPLICATE schedules, multiplying the
              // dispatch rate by the repeat count (round-13 review:
              // repeat=3 with an Interval task dispatched 3x per period
              // forever)
              if (firstPass)
                tasks.add(ScheduledTask(t.id, tr, t.value, guard(t)))
            case None => if (guard(t)()) dispatch(t.id, t.value)
          }
        }
        horizonMs
      }
      def runPass(remaining: Int): Unit = if (remaining > 0) {
        if (s.run == "step") runStep(s.tasks.toList, () => runPass(remaining - 1))
        else {
          val horizonMs = oneshotPass(firstPass = remaining == totalPasses)
          if (remaining > 1) {
            if (horizonMs == 0L) runPass(remaining - 1)
            else scheduler.schedule((() => runPass(remaining - 1)): Runnable,
              horizonMs, TimeUnit.MILLISECONDS)
          }
        }
      }
      runPass(totalPasses)
      true
  }

  /** Step mode: each task runs after the previous one completed; a
    * failing guard stops the set (the reference then runs the `failure`
    * set — surfaced to the caller as a false return from the guard, the
    * alert path being control plane). A failing guard — or a throwing
    * dispatch — also cancels the remaining replay passes, which is what
    * "stop at the first failing task" means across a repeat. `done`
    * fires only when the whole pass completed.
    */
  private def runStep(rest: List[TaskSpec], done: () => Unit): Unit = rest match {
    case Nil => done()
    case t :: more =>
      val run: Runnable = () =>
        if (guard(t)()) {
          outputs.put(t.id, t.output)
          val ok =
            try { dispatch(t.id, t.value); true }
            catch {
              case scala.util.control.NonFatal(e) =>
                System.err.println(
                  s"[tasks] step task '${t.id}' failed - set stopped: $e")
                false
            }
          if (ok) runStep(more, done)
        }
      t.trigger match {
        case Some(Delay(d)) => scheduler.schedule(run, d, TimeUnit.MILLISECONDS)
        case _ => run.run()
      }
  }

  def fireKeyword(word: String): Unit = tasks.fireKeyword(word)
  def shutdown(): Unit = tasks.shutdown()
}
