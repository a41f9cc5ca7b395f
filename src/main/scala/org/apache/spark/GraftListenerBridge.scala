package org.apache.spark

/** Same-package access shim: `SparkContext.listenerBus` is
  * private[spark], but the bench needs to flush pending listener events
  * before reading its shuffle-byte accumulator — otherwise per-query
  * attribution races stage-completion delivery. */
object GraftListenerBridge {
  def flushListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
