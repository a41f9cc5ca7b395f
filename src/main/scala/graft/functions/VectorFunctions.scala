package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * higher-order array expressions (`zip_with`/`aggregate`) — no UDF, no
  * MLlib Vector conversion, fully codegen-compatible.
  *
  * Every element is cast to double BEFORE multiplying and the fold is a
  * strict left-to-right accumulation, so results are deterministic and
  * reproducible by the DuckDB oracle (`list_sum(list_transform(list_zip...`)
  * to within one ulp — float accumulation would drift at 1e-7 and flip
  * top-k ranks between engines.
  */
object VectorFunctions {

  /** Dot product in double precision — the codegen'd native expression
    * (graft.plans.DotProduct); numerically identical to the composable
    * `aggregate(zip_with(...))` form (see [[dotComposable]]) but ~40×
    * faster on pairwise joins. */
  def dot(a: Column, b: Column): Column = graft.plans.DotProduct(a, b)

  /** Reference implementation via higher-order built-ins; kept as the
    * semantic spec for [[dot]] (asserted equal in SimilaritySpec). */
  def dotComposable(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision; null for zero vectors (ANSI
    * Spark throws on /0 where DuckDB yields inf/nan — null is safe and
    * unreachable for real embedding data). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(l2Norm(a) * l2Norm(b), lit(0.0))

  /** Sign bit of the projection of `a` onto a deterministic pseudo-random
    * hyperplane (per plane index): the building block of the LSH bucketer
    * in graft.operators.Similarity. Plane components are ±1 derived from
    * md5 of (plane, dimension), so every engine and every run agrees. */
  def hyperplaneSign(a: Column, plane: Int): Column = {
    val proj = aggregate(
      zip_with(
        a,
        transform(sequence(lit(0), size(a) - 1),
          i => (TextFunctions.hash32(concat(lit(s"p${plane}_"), i)) % 2) * 2 - 1),
        (x, s) => x.cast("double") * s.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }
}
