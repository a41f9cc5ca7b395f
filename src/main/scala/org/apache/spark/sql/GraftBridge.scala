package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column↔Expression converters — the
  * supported pattern for extension libraries shipping custom Catalyst
  * expressions (Spark 4 wraps Column around ColumnNode, so a plain
  * constructor call no longer exists). This is the ONLY file outside the
  * graft package; everything else goes through it. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Block until the async listener bus has delivered every queued
    * event — listener-held counters (graft.JobCount) are incomplete
    * without this; `listenerBus` is private[spark], hence bridged. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
