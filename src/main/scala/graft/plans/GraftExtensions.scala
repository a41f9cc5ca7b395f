package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SQL exposure of the native expressions: `graft_dot(a, b)` becomes
  * callable from `spark.sql(...)` and SQL-only clients.
  *
  * Two registration paths:
  *  - [[GraftExtensions]] for session construction
  *    (`.withExtensions(new GraftExtensions)`) or
  *    `spark.sql.extensions=graft.plans.GraftExtensions` cluster config;
  *  - [[GraftFunctions.register]] for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
}

object GraftFunctions {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)),
      "scala_udf")
}
