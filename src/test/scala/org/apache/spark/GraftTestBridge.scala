package org.apache.spark

/** Test-only bridge into Spark internals: `SparkContext.listenerBus` is
  * private[spark], but deterministic listener assertions need to wait for
  * the async bus to drain instead of sleeping a fixed interval (which
  * silently passes when a loaded machine delivers events late).
  */
object GraftTestBridge {
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
