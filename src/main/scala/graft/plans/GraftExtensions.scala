package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SQL exposure of the native expressions: `graft_dot(a, b)` and
  * `graft_hyperplane_bucket(vec, planeOffset, planeCount)` become
  * callable from `spark.sql(...)` and SQL-only clients, plus the
  * [[AsOfJoinStrategy]] planner rule for the native as-of join node.
  *
  * Two registration paths:
  *  - [[GraftExtensions]] for session construction
  *    (`.withExtensions(new GraftExtensions)`) or
  *    `spark.sql.extensions=graft.plans.GraftExtensions` cluster config;
  *  - [[GraftFunctions.register]] for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftFunctions.{buildBucket, buildDot}

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectResolutionRule(_ => ResolveAsOfJoin)
    // SQL-callable as-of join: SELECT * FROM asof_join('l','r','k','ts','v')
    // — the one operator a SQL-only client couldn't reach before. Needs a
    // session built with these extensions (the resolution rule cannot be
    // added to a live session), the standard contract for Spark extension
    // modules.
    e.injectTableFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("asof_join"),
      new ExpressionInfo(classOf[AsOfJoinNode].getName, "asof_join"),
      GraftFunctions.buildAsOfJoin))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      buildDot))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "graft_hyperplane_bucket"),
      buildBucket))
  }
}

object GraftFunctions {
  private[plans] def litInt(e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"graft_hyperplane_bucket expects integer literals for the plane arguments, got $other")
    }

  private def requireArity(
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      n: Int, usage: String): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$usage expects $n arguments, got ${exprs.length}")

  private[plans] val buildDot:
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => {
      requireArity(exprs, 2, "graft_dot(a, b)")
      DotProduct(exprs(0), exprs(1))
    }

  private[plans] val buildBucket:
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression =
    exprs => {
      requireArity(exprs, 3, "graft_hyperplane_bucket(vec, planeOffset, planeCount)")
      HyperplaneBuckets(exprs(0), litInt(exprs(1)), litInt(exprs(2)))
    }

  /** TVF builder: asof_join(leftTable, rightTable, key, ts, value[, outName]).
    * Table names may be qualified ("db.t"); returns the pre-resolution
    * placeholder that [[ResolveAsOfJoin]] finishes. */
  private[plans] val buildAsOfJoin:
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = exprs => {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
    import org.apache.spark.sql.types.StringType
    val usage = "asof_join(leftTable, rightTable, key, ts, value[, outName])"
    if (exprs.length < 5 || exprs.length > 6)
      throw new IllegalArgumentException(s"$usage expects 5 or 6 arguments, got ${exprs.length}")
    def litStr(e: Expression): String = e match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) if s != null =>
        s.toString
      case other => throw new IllegalArgumentException(
        s"$usage expects non-null string literals, got $other")
    }
    val args = exprs.map(litStr)
    UnresolvedAsOfJoin(
      UnresolvedRelation(args(0).split('.').toIndexedSeq),
      UnresolvedRelation(args(1).split('.').toIndexedSeq),
      args(2), args(3), args(4),
      if (args.length == 6) args(5) else "asof_value")
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      buildDot,
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hyperplane_bucket",
      buildBucket,
      "scala_udf")
  }
}
