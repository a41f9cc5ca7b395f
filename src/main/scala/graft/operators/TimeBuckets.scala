package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Shared exact-integer time bucketing for the chunked/banded operators.
  *
  * `floor(ts / n)` via double division misrounds epoch-nano longs: the
  * double ulp at 2024 epochs (~1.7e18 ns) is ≈ 256 ns, so a row within
  * ~128 ns of a bucket boundary can land in the wrong bucket — silently
  * diverging from exact-arithmetic oracles. (ts − pmod(ts, n)) is exactly
  * divisible by n, so integer `div` equals floor, including for negative
  * ts. One definition, used by [[SaltedWindow]] and [[BandJoin]].
  */
object TimeBuckets {
  def floorDiv(tsCol: String, n: Long): Column =
    expr(s"(`$tsCol` - pmod(`$tsCol`, ${n}L)) div ${n}L")
}
