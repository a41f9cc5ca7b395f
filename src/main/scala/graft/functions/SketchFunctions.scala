package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch probe for frequency estimation over a sketch built
  * by Spark's own `count_min_sketch` aggregate (maps the reference's
  * pandas `value_counts` top-N dashboards — regression.py's
  * per-category frequency tables — onto the mergeable-sketch shape that
  * survives 100 TB).
  *
  * Spark ships the BUILD side (the `count_min_sketch(col, eps, conf,
  * seed)` aggregate: constant-size map-side partials, tree-merged — one
  * pass, no per-key shuffle state) but no probe; this is the missing
  * read half, mirroring how [[BloomFunctions]] pairs
  * `stat.bloomFilter` with `BloomFilterMightContain`.
  *
  * CMS theorems the callers gate on: the estimate NEVER undercounts
  * (each cell only ever adds), and overcounts by at most ε·N with
  * probability ≥ confidence (N = total items in the sketch).
  *
  * Probe cost: each evaluation deserializes the sketch column's bytes.
  * That is the right trade only because probes are FEW by construction
  * (a top-k candidate row per group joined against its group's sketch —
  * k·groups rows total); for a wide probe (estimating every row of a
  * corpus), deserialize once instead: build the sketch driver-side
  * (`df.stat.countMinSketch`, the [[BloomFunctions.buildLongBloom]]
  * pattern) and close over the deserialized object in a literal-bound
  * expression. */
case class CountMinEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  // inputs must be (binary sketch, long item); callers are
  // library-internal (AbstractDataType/ExpectsInputTypes are
  // private[sql] in Spark 4 — the DotProduct precedent)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(sketchBytes: Any, item: Any): Any =
    CountMinEstimate.estimate(sketchBytes.asInstanceOf[Array[Byte]],
      item.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, v) =>
      s"graft.functions.CountMinEstimate.estimate($s, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}

object CountMinEstimate {
  /** Static entry shared by eval and generated code (stateless — see
    * the class Scaladoc for why per-call deserialization is acceptable
    * at the intended probe cardinality). */
  def estimate(bytes: Array[Byte], item: Long): Long =
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
      .estimateCount(java.lang.Long.valueOf(item))
}

object SketchFunctions {
  /** Estimated frequency of LONG `item` in the CMS `sketch` (a binary
    * column from the `count_min_sketch` aggregate). */
  def cmsEstimate(sketch: Column, item: Column): Column =
    GraftBridge.column(CountMinEstimate(
      GraftBridge.expression(sketch), GraftBridge.expression(item)))
}
