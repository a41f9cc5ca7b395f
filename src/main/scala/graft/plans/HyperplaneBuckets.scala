package graft.plans

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Packed random-hyperplane sign bucket over an `array<float>` embedding,
  * as a single-pass codegen'd Catalyst expression: bit j of the result is
  * the sign (≥ 0 → 1) of the projection onto deterministic pseudo-random
  * plane `planeOffset + j`, for j in [0, planeCount).
  *
  * Why custom (same escape hatch as [[DotProduct]]): the composable form
  * (`VectorFunctions.hyperplaneSign` per plane) walks the array once PER
  * PLANE through the higher-order-function machinery — 8 planes = 8
  * interpreted passes with an intermediate array each. This expression
  * accumulates all projections in one tight primitive loop.
  *
  * Determinism contract: plane components are ±1 derived from
  * md5("p<plane>_<dim>") exactly as the composable form derives them
  * (TextFunctions.hash32 % 2), so buckets are bit-identical across the
  * two forms, engines, and runs — asserted in SimilaritySpec. The sign
  * table depends only on (plane, dim): it is precomputed once on the
  * driver and shipped as a literal reference, so no hashing happens per
  * row. */
case class HyperplaneBuckets(child: Expression, planeOffset: Int, planeCount: Int)
    extends UnaryExpression {

  require(planeCount >= 1 && planeCount <= 62, "planeCount must be in [1, 62]")

  override def dataType: DataType = LongType

  @transient private lazy val signs: Array[Array[Byte]] =
    HyperplaneBuckets.signTable(planeOffset, planeCount)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() > HyperplaneBuckets.MaxDim) {
      throw new IllegalArgumentException(
        s"HyperplaneBuckets supports up to ${HyperplaneBuckets.MaxDim} dimensions, " +
          s"got ${x.numElements()}")
    }
    val n = x.numElements()
    val acc = new Array[Double](planeCount)
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      var p = 0
      while (p < planeCount) {
        acc(p) += v * signs(p)(i)
        p += 1
      }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < planeCount) {
      if (acc(p) >= 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("hpSigns", signs, "byte[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val acc = ctx.freshName("acc")
      val b = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      s"""
         |int $n = $a.numElements();
         |if ($n > ${HyperplaneBuckets.MaxDim}) {
         |  throw new IllegalArgumentException(
         |    "HyperplaneBuckets supports up to ${HyperplaneBuckets.MaxDim} dimensions, got " + $n);
         |}
         |double[] $acc = new double[$planeCount];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  for (int $p = 0; $p < $planeCount; $p++) {
         |    $acc[$p] += $v * $tableRef[$p][$i];
         |  }
         |}
         |long $b = 0L;
         |for (int $p = 0; $p < $planeCount; $p++) {
         |  if ($acc[$p] >= 0) $b |= 1L << $p;
         |}
         |${ev.value} = $b;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {

  /** Embeddings beyond this dimensionality would need a larger table —
    * fail loudly rather than silently truncating planes. */
  val MaxDim = 4096

  /** ±1 component of plane `plane` at dimension `dim` — EXACTLY the
    * composable derivation: low bit of hash32(md5("p<plane>_<dim>")). */
  private def sign(plane: Int, dim: Int): Byte = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"p${plane}_$dim".getBytes("UTF-8"))
    // hash32 = first 8 hex chars (4 bytes) as a long; % 2 = low bit of
    // the 4th byte
    if ((md(3) & 1) == 1) 1 else -1
  }

  private val tableCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int), Array[Array[Byte]]]

  def signTable(planeOffset: Int, planeCount: Int): Array[Array[Byte]] =
    tableCache.getOrElseUpdate((planeOffset, planeCount),
      Array.tabulate(planeCount, MaxDim)((p, d) => sign(planeOffset + p, d)))

  /** Column-facing constructor: packed bucket of planes
    * [planeOffset, planeOffset + planeCount). */
  def apply(vec: Column, planeOffset: Int, planeCount: Int): Column =
    GraftBridge.column(HyperplaneBuckets(GraftBridge.expression(vec), planeOffset, planeCount))
}
