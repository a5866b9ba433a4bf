package org.apache.spark

/** Test-only bridge to the private[spark] listener bus: deterministic
  * drain for assertions that count listener-delivered events. The
  * zero-jobs-at-gate-scale lock slept 300 ms and hoped the bus had
  * delivered (round-13 ADVICE: a loaded CI bus could deliver a real job
  * event after the assert, false-passing the regression lock);
  * waitUntilEmpty blocks until every queued event is dispatched. */
object GraftTestBus {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
