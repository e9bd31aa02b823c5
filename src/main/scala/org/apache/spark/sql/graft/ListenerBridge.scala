package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** `private[spark]` access bridge for the re-execution probes.
  *
  * SparkListener events are posted ASYNCHRONOUSLY: a probe that asserts
  * on a listener-maintained counter right after an action can read the
  * counter before the event that increments it has been delivered (a
  * healthy run failing), or — worse — pass on events that belong to an
  * EARLIER action (a vacuous gate). Draining the bus between actions
  * makes listener counters sequentially consistent with the actions
  * they observe. The method itself lives in `LiveListenerBus` as
  * `private[spark] waitUntilEmpty()`; this object re-exports it from
  * the `org.apache.spark` package tree the same way the native
  * operators in this directory reach Catalyst internals.
  */
object ListenerBridge {
  /** Block until every queued listener event has been delivered (10 s
    * internal timeout -> TimeoutException, which a probe should treat
    * as a hard failure rather than asserting on stale counts).
    */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
