package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Algebraic partial-aggregate contract — the incremental-rollup /
  * re-aggregation pattern (reference behavior: the dashboard's summary
  * cards recompute daily stats from scratch on every refresh;
  * `regression.py`'s describe-style panels rescan the frame per metric).
  * Here the two phases are explicit operators:
  *
  *  - [[partials]] reduces a fact frame ONCE to constant-size moment
  *    partials (n, Σv, Σv², min, max) at a fine key grain — e.g.
  *    (flag, month). One scan, one map-side-combined shuffle sized by
  *    the fine-grain cardinality, never by the fact count.
  *  - [[merge]] combines partials to any coarser grain — daily partials
  *    roll into monthly/total without touching the facts again. Merge
  *    is associative (merging merged partials == one merge, spec-pinned)
  *    so a 100 TB deployment maintains the fine-grain table
  *    incrementally (yesterday's partials are immutable; only the new
  *    day is computed from facts) and serves ANY coarser rollup from
  *    metadata-scale state. This is exactly the mergeable-state shape
  *    Spark's own partial aggregation uses inside one query, lifted to
  *    a persistable cross-query artifact.
  *  - [[derive]] turns merged moments into mean / sample-std. The std
  *    comes from the moment identity Var = (Σv² − (Σv)²/n)/(n−1) over
  *    EXACT integer sums, so the derived values are bit-identical in
  *    any IEEE engine (each double op is exactly determined by its
  *    integer inputs; sqrt is correctly rounded) — no Welford-order
  *    sensitivity, which is what makes the result oracle-comparable.
  *
  * Exactness contract: `valueCol` must be integer-valued (callers scale
  * decimals to cents first — the q1 cents idiom). Sums accumulate in
  * LONG: Σv² stays exact while n·max(v)² < 2⁶³ (e.g. 10⁹ rows of
  * |v| ≤ 3·10⁶). Past that, scale the value down or widen the sum
  * columns to decimal(38,0) — the merge algebra is unchanged.
  */
object PartialAgg {

  /** Moment partials of `valueCol` at the (keys ++ fine) grain.
    * Output: keys ++ fine-alias columns ++ (n, s, s2, mn, mx).
    * `n` counts NON-NULL values — the same rows the sums aggregate —
    * so a nullable metric yields the statistics OF ITS PRESENT VALUES
    * (matching avg/stddev_samp semantics) instead of silently diluting
    * the mean with null rows. */
  def partials(df: DataFrame, keys: Seq[String], fine: Seq[Column],
               valueCol: Column): DataFrame = {
    val v = valueCol.cast("long")
    df.groupBy((keys.map(col) ++ fine): _*)
      .agg(
        count(v).as("n"),
        sum(v).as("s"),
        sum(v * v).as("s2"),
        min(v).as("mn"),
        max(v).as("mx"))
  }

  /** Merge partials to the `keys` grain. Accepts the output of
    * [[partials]] OR of a previous merge (the partial columns are the
    * same five; `n_partials` of a re-merge counts input partials, not
    * original fine cells). */
  def merge(partials: DataFrame, keys: Seq[String]): DataFrame =
    partials.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_partials"),
        sum(col("n")).as("n"),
        sum(col("s")).as("s"),
        sum(col("s2")).as("s2"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))

  /** Derived statistics from merged moments: mean = s/n and sample std
    * via the moment identity (NULL when n < 2 — no 0/0). Division and
    * sqrt over the exact integer sums are engine-deterministic.
    *
    * The variance is clamped at 0 before the sqrt (review r10): the
    * integer SUMS are exact to 2⁶³, but the derived double arithmetic
    * loses to cancellation once s² approaches 2⁵³ — a near-constant
    * group at the documented |v| bound can evaluate the numerator
    * slightly NEGATIVE and a bare sqrt would poison the column with
    * NaN. The clamp makes the failure mode "std underreported toward
    * 0 for near-constant billion-row groups", never NaN; callers
    * needing exact std at that scale should center values first
    * (subtract a per-group anchor before [[partials]] — the moment
    * identity is shift-invariant). */
  def derive(merged: DataFrame): DataFrame = {
    val n = col("n").cast("double")
    val s = col("s").cast("double")
    val variance = (col("s2").cast("double") - s * s / n) /
      (col("n") - lit(1)).cast("double")
    merged
      .withColumn("mean", s / n)
      .withColumn("std", when(col("n") >= 2, sqrt(greatest(variance, lit(0.0)))))
  }
}
