package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.floor

/** Helpers shared by the oracle-compared query groups. */
package object queries {

  /** Engine-deterministic rounding: floor(x·10^s + 0.5)/10^s.
    *
    * Builtin round() is NOT cross-engine-safe on exact decimal ties: Spark
    * rounds the shortest decimal representation (BigDecimal.valueOf →
    * HALF_UP) while DuckDB rounds the binary double (std::round), so e.g.
    * an exact 42.38625 rounds to 42.3863 in Spark and 42.3862 in DuckDB.
    * This formulation is plain IEEE arithmetic — identical in any engine
    * given identical inputs, and identical-by-construction inputs are what
    * the cents-exact aggregation helpers (TimeSeries.smaCents) provide.
    * floor() yields Long in Spark and Double in DuckDB; the final division
    * converges both to the same double. */
  def rnd(c: Column, s: Int): Column = {
    val p = math.pow(10, s)
    floor(c * p + 0.5) / p
  }

  /** DuckDB twin of [[rnd]]. */
  def rndSql(e: String, s: Int): String =
    s"floor(($e) * 1e$s + 0.5) / 1e$s"

  /** Calendar day of a NAMED epoch-nano column — Tables.eventDay
    * parameterized on the column name; THE nanos→day conversion for
    * frame-generic operators (the r10 "truncation rule must live once"
    * rule, re-hit by review r12 when three more hand-rolled copies
    * grew). `div` both keeps the arithmetic integral and fails LOUDLY
    * on a timestamp-typed column instead of silently reading seconds. */
  def dayOf(tsCol: String): Column = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros, to_date}
    to_date(timestamp_micros(expr(s"`$tsCol` div 1000")))
  }

  /** Per-group daily event-count rollup — `(event_type, day, x)` off
    * ONE fact-volume pass; THE day-series entry point for the
    * trend / changepoint / runs / autocorrelation / completeness
    * family (review r13 second leg: seven verbatim copies had grown
    * across the day-grain operators; like [[dayOf]] itself, the
    * rollup lives once or it drifts). */
  def dailyCounts(df: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit}
    df.select(col(typeCol).as("event_type"), dayOf(tsCol).as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("x"))
  }

  /** Per-user lag-1 transition counts — `(prev, next, n)` off one
    * per-user (ts, id)-ordered window; THE definition of "transition"
    * shared by transitionMatrix and markovEntropy (review r14: the
    * pair extraction had grown a verbatim copy — like [[dailyCounts]],
    * the definition lives once or the two operators silently condition
    * on different graphs). */
  def transitionPairs(df: DataFrame, userCol: String, typeCol: String,
                      tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, count, lag, lit}
    val wu = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    df.select(col(userCol), col(typeCol).as("next"),
        lag(col(typeCol), 1).over(wu).as("prev"))
      .filter(col("prev").isNotNull)
      .groupBy("prev", "next").agg(count(lit(1)).as("n"))
  }

  /** Zero-filled per-group daily counts on the COMPLETE calendar spine
    * between each group's first and last active day — [[dailyCounts]]
    * left-joined onto `sequence(min(day), max(day))` with absent days
    * as 0. THE day-series frame for spine-dependent statistics
    * (dispersion index, peak detection; r16 added the changepoint
    * family + autocorr): the observed-only series is zero-TRUNCATED
    * and mis-reads sparse bursts (review r13), and the spine block was
    * growing verbatim copies (review r14 — the dailyCounts lesson one
    * level up). NULL group keys must be excluded by the CALLER (the
    * non-null-safe spine join would zero-fill them into garbage rows
    * both engines agree on).
    *
    * Plan shape: TWO fact scans — the bounds agg and the fill join
    * each re-derive the daily rollup (column pruning de-canonicalizes
    * the subtrees, so ReuseExchange does not fire; the PlanSpec pins
    * document `<= 2`). At corpus scale the right shape is to
    * MATERIALIZE the daily rollup once (it is types × days — tiny) and
    * feed both legs from the artifact; at fixture scale the second
    * scan costs less than the write. */
  def zeroFilledDaily(df: DataFrame, typeCol: String,
                      tsCol: String): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, explode, expr, lit, max, min}
    val daily = dailyCounts(df, typeCol, tsCol)
    val spine = daily.groupBy("event_type")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"), explode(expr("sequence(d0, d1)")).as("day"))
    spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("x"), lit(0L)).as("x"))
  }

  /** Hour-of-day (0-23) of a NAMED epoch-nano column — the third member
    * of the truncation-rule family beside [[dayOf]]/[[centsOf]] (review
    * r12: chiSquare and linregClosed had grown hand-rolled copies of
    * the nanos→micros conversion; the rule lives once or it drifts). */
  def hourOf(tsCol: String): Column = {
    import org.apache.spark.sql.functions.{expr, hour, timestamp_micros}
    hour(timestamp_micros(expr(s"`$tsCol` div 1000")))
  }

  /** Exact integer cents of a NAMED 2-dp value column — the shared
    * cent-scaling every exact-moment recipe feeds on (one definition,
    * same reason as [[dayOf]]). */
  def centsOf(c: String): Column = {
    import org.apache.spark.sql.functions.expr
    expr(s"CAST(floor(`$c` * 100 + 0.5) AS BIGINT)")
  }

  /** Cross-engine exact-moment recipe (the PartialAgg derivation),
    * written ONCE per engine: mean and clamped sample variance in VALUE
    * units from the exact integer-cent sums (n, Σc, Σc²). Every
    * consumer (seasonal baseline, Welch t-test) must use these rather
    * than hand-mirroring the fixed-order expression — a one-sided edit
    * to a private copy silently breaks oracle parity.
    *
    * Long-exactness bound for the Σc² input: c ≤ 1e5 cents ⇒ c² ≤ 1e10,
    * so the sum stays under 2^63 up to ~9·10⁸ rows per group; past
    * that, widen the partial as PartialAgg's Scaladoc prescribes. */
  def meanFromCents(n: Column, sumc: Column): Column =
    (sumc.cast("double") / n.cast("double")) / 100.0

  def varFromCents(n: Column, sumc: Column, sumsq: Column): Column = {
    import org.apache.spark.sql.functions.{greatest, lit}
    val nd = n.cast("double")
    val sc = sumc.cast("double")
    greatest(lit(0.0),
      (nd * sumsq.cast("double") - sc * sc) / (nd * (nd - 1.0))) / 10000.0
  }

  /** DuckDB twins of [[meanFromCents]] / [[varFromCents]] — identical
    * token order. */
  def meanFromCentsSql(n: String, sumc: String): String =
    s"(CAST($sumc AS DOUBLE) / CAST($n AS DOUBLE)) / 100.0"

  def varFromCentsSql(n: String, sumc: String, sumsq: String): String =
    s"greatest(0.0, (CAST($n AS DOUBLE) * CAST($sumsq AS DOUBLE)" +
      s" - CAST($sumc AS DOUBLE) * CAST($sumc AS DOUBLE))" +
      s" / (CAST($n AS DOUBLE) * (CAST($n AS DOUBLE) - 1.0))) / 10000.0"
}
