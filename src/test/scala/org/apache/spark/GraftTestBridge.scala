package org.apache.spark

/** Test-only bridge into `private[spark]` surface: lets specs drain the
  * listener bus so job-count assertions are deterministic instead of
  * racing async event delivery.
  */
object GraftTestBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
