package graft

import java.time.{DayOfWeek, Instant, LocalTime}
import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming._

/** §2.8 task scheduling plane: interval/clock/keyword/delay/while/waitfor
  * triggers with req guards (Task.java TRIGGERTYPE semantics).
  */
class TaskSchedulerSpec extends AnyFunSuite {

  private def collectDispatch(): (ConcurrentLinkedQueue[(String, String)], (String, String) => Unit) = {
    val q = new ConcurrentLinkedQueue[(String, String)]()
    (q, (id, cmd) => q.add((id, cmd)))
  }

  private def awaitCount(q: ConcurrentLinkedQueue[_], n: Int, ms: Long = 5000): Unit = {
    val deadline = System.currentTimeMillis() + ms
    while (q.size < n && System.currentTimeMillis() < deadline) Thread.sleep(20)
  }

  test("interval tasks fire repeatedly; req=false skips the execution") {
    val (fired, dispatch) = collectDispatch()
    @volatile var allow = true
    val ts = new TaskScheduler(dispatch)
    try {
      ts.add(ScheduledTask("beat", Interval(50), "st", req = () => allow))
      awaitCount(fired, 2)
      assert(fired.size >= 2)
      allow = false
      Thread.sleep(200)
      val at = fired.size
      Thread.sleep(200)
      assert(fired.size == at, "guard=false must skip executions")
    } finally ts.shutdown()
  }

  test("delay fires once; keyword fires only when the keyword arrives") {
    val (fired, dispatch) = collectDispatch()
    val ts = new TaskScheduler(dispatch)
    try {
      ts.add(ScheduledTask("once", Delay(50), "hello"))
      ts.add(ScheduledTask("kw", Keyword("alarm"), "siren:on"))
      awaitCount(fired, 1)
      Thread.sleep(150)
      assert(fired.toArray.toSeq == Seq(("once", "hello")))
      ts.fireKeyword("other") // no match
      ts.fireKeyword("alarm")
      assert(fired.toArray.toSeq == Seq(("once", "hello"), ("kw", "siren:on")))
    } finally ts.shutdown()
  }

  test("waitfor polls until the check holds, then dispatches once") {
    val (fired, dispatch) = collectDispatch()
    @volatile var ready = false
    val ts = new TaskScheduler(dispatch)
    try {
      ts.add(ScheduledTask("wf", WaitFor(intervalMs = 40, maxChecks = 50),
        "proceed", req = () => ready))
      Thread.sleep(150)
      assert(fired.isEmpty)
      ready = true
      awaitCount(fired, 1)
      Thread.sleep(150)
      assert(fired.toArray.toSeq == Seq(("wf", "proceed")), "dispatch exactly once")
    } finally ts.shutdown()
  }

  test("waitfor gives up after maxChecks polls") {
    val (fired, dispatch) = collectDispatch()
    val ts = new TaskScheduler(dispatch)
    try {
      ts.add(ScheduledTask("wf", WaitFor(intervalMs = 30, maxChecks = 3),
        "never", req = () => false))
      Thread.sleep(300)
      assert(fired.isEmpty)
    } finally ts.shutdown()
  }

  test("while runs at interval while the check holds, then stops") {
    val (fired, dispatch) = collectDispatch()
    @volatile var on = true
    val ts = new TaskScheduler(dispatch)
    try {
      ts.add(ScheduledTask("w", While(intervalMs = 40, maxChecks = 100),
        "pump", req = () => on))
      awaitCount(fired, 2)
      on = false
      Thread.sleep(150)
      val at = fired.size
      Thread.sleep(150)
      assert(fired.size == at, "while must stop when the check fails")
      assert(at >= 2)
    } finally ts.shutdown()
  }

  test("clock delay arithmetic: next occurrence honors time, day set, utc") {
    import TaskScheduler.nextClockDelayMs
    // Mon 2024-03-04 10:00:00Z
    val now = Instant.parse("2024-03-04T10:00:00Z")
    // later today
    assert(nextClockDelayMs(LocalTime.of(12, 30), Set.empty, utc = true, now)
      == 2L * 3600000 + 30 * 60000)
    // earlier today -> tomorrow
    assert(nextClockDelayMs(LocalTime.of(9, 0), Set.empty, utc = true, now)
      == 23L * 3600000)
    // day-restricted: only Friday (Mar 8) at 09:00
    assert(nextClockDelayMs(LocalTime.of(9, 0), Set(DayOfWeek.FRIDAY), utc = true, now)
      == (24L * 4 - 1) * 3600000)
    // exactly now -> tomorrow, not immediate
    assert(nextClockDelayMs(LocalTime.of(10, 0), Set.empty, utc = true, now)
      == 24L * 3600000)
  }

  test("a parsed tasklist runs end-to-end: arming, chaining, sets, keywords") {
    val sent = new ConcurrentLinkedQueue[(String, String, String)]()
    @volatile var ready = false
    val tl = DcafsXml.parseTasks(
      """<tasklist>
        |  <tasksets>
        |    <taskset id="boot" run="step">
        |      <task output="stream:dev">GO 1</task>
        |      <task output="stream:dev" trigger="delay:50ms">GO 2</task>
        |      <task output="stream:dev" req="never">GO 3</task>
        |      <task output="stream:dev">GO 4</task>
        |    </taskset>
        |    <taskset id="alarm">
        |      <task output="log:info">over temp</task>
        |    </taskset>
        |  </tasksets>
        |  <tasks>
        |    <task id="beat" output="system" trigger="interval:40ms">st</task>
        |    <task id="chain" output="manager" trigger="delay:30ms">taskset:boot</task>
        |    <task id="kw" output="system" trigger="keyword:alert">taskset:alarm</task>
        |    <task id="poll" output="system" trigger="retry:30ms,50" req="ready">ok</task>
        |  </tasks>
        |</tasklist>""".stripMargin)
    val r = new TasklistRunner(tl,
      send = (id, out, v) => sent.add((id, out, v)),
      compileReq = { case "ready" => () => ready; case _ => () => false })
    try {
      // interval heartbeat arms at construction
      awaitCount(sent, 2)
      assert(sent.stream().anyMatch(s => s._1 == "beat" && s._3 == "st"))
      // chained taskset:boot runs step-mode: GO 1, then GO 2 after its
      // delay, then stops at GO 3's failing guard (GO 4 never runs)
      val deadline = System.currentTimeMillis() + 5000
      while (!sent.stream().anyMatch(_._3 == "GO 2") &&
        System.currentTimeMillis() < deadline) Thread.sleep(20)
      val gos = sent.toArray.toSeq.collect {
        case (_, "stream:dev", v) => v
      }
      assert(gos == Seq("GO 1", "GO 2"), s"got $gos")
      // keyword fires the oneshot alarm set
      r.fireKeyword("alert")
      assert(sent.stream().anyMatch(s => s._2 == "log:info" && s._3 == "over temp"))
      // waitfor guard: nothing until ready flips, then exactly once
      assert(!sent.stream().anyMatch(_._3 == "ok"))
      ready = true
      awaitOk(sent)
      assert(sent.toArray.toSeq.count(_.asInstanceOf[(String, String, String)]._3 == "ok") == 1)
    } finally r.shutdown()
  }

  test("a throwing dispatch does not kill a recurring task") {
    // scheduleAtFixedRate suppresses all future runs after one thrown
    // exception — a single transient dispatch failure (socket down for
    // one tick) must not permanently and silently end an interval task
    val fired = new ConcurrentLinkedQueue[(String, String)]()
    @volatile var boom = true
    val ts = new TaskScheduler((id, cmd) => {
      if (boom) { boom = false; throw new RuntimeException("socket down") }
      fired.add((id, cmd))
    })
    try {
      ts.add(ScheduledTask("beat", Interval(40), "st"))
      awaitCount(fired, 2)
      assert(fired.size >= 2, "task must stay armed after a failed tick")
      assert(!boom, "the first tick must actually have thrown")
    } finally ts.shutdown()
  }

  test("step-set replay passes run sequentially, not interleaved") {
    // repeat=2 with a Delay on a LATER step: a plain replay loop starts
    // pass 2 the moment pass 1's delay is SCHEDULED, so both pass-1
    // tasks interleave with pass 2's (GO 1, GO 1, GO 2, GO 2) — the
    // replay must chain pass 2 after pass 1's last task completes
    val sent = new ConcurrentLinkedQueue[(String, String, String)]()
    val tl = DcafsXml.Tasklist(Nil, Seq(DcafsXml.TaskSetSpec(
      "boot", "boot", "step", 2, Seq(
        DcafsXml.TaskSpec("t1", None, "stream:dev", "GO 1", None),
        DcafsXml.TaskSpec("t2", Some(Delay(60)), "stream:dev", "GO 2", None)))))
    val r = new TasklistRunner(tl, send = (id, out, v) => sent.add((id, out, v)))
    try {
      r.startSet("boot")
      val deadline = System.currentTimeMillis() + 5000
      while (sent.size < 4 && System.currentTimeMillis() < deadline)
        Thread.sleep(20)
      val vs = sent.toArray.toSeq
        .map(_.asInstanceOf[(String, String, String)]._3)
      assert(vs == Seq("GO 1", "GO 2", "GO 1", "GO 2"), s"got $vs")
    } finally r.shutdown()
  }

  private def awaitOk(q: ConcurrentLinkedQueue[(String, String, String)],
      ms: Long = 5000): Unit = {
    val deadline = System.currentTimeMillis() + ms
    while (!q.stream().anyMatch(_._3 == "ok") &&
      System.currentTimeMillis() < deadline) Thread.sleep(20)
    Thread.sleep(120) // let any wrong extra dispatch surface
  }
}
