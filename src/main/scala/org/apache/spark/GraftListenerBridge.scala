package org.apache.spark

/** Same-package access shim: `SparkContext.listenerBus` is
  * private[spark], but the bench needs to flush pending listener events
  * before reading its shuffle-byte accumulator — otherwise per-query
  * attribution races stage-completion delivery.
  *
  * A flush timeout must NOT surface as a failure of the (already
  * successful) query it follows: swallow it and accept slightly stale
  * byte attribution for that rep. */
object GraftListenerBridge {
  def flushListeners(sc: SparkContext, timeoutMs: Long = 60000): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
