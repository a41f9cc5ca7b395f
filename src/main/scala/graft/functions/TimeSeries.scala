package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Time-series feature helpers — the reference's analytical core (SURVEY.md
  * §2.5, W1-W11) as composable Column builders over a shared WindowSpec.
  *
  * Reference semantics preserved:
  *  - "ema12"/"ema26" are simple moving averages over [-12,0]/[-26,0]
  *    (reference ml-algorithms/regression.py:112-114 computes an SMA and
  *    calls it EMA); [[sma]] reproduces that, a true EMA is out of scope.
  *  - RSI excludes the current row (frame [-n,-1]) with the +1e-6 epsilon
  *    guard (reference regression.py:99-108).
  *  - volatility is the SAMPLE stddev (pandas ddof=1, regression.py:93)
  *    while the global z-score is POPULATION stddev (scipy zscore ddof=0,
  *    spark_stream.py:134-138) — both are exposed, correctly named.
  *
  * Every helper expands to built-in Catalyst expressions: whole-stage
  * codegen applies, and all features sharing one (partitionBy, orderBy)
  * WindowSpec collapse into a single WindowExec (one shuffle + one sort)
  * via Catalyst's CollapseWindow rule — the property that makes a 30-column
  * feature block one pass over 100 TB instead of 30.
  */
object TimeSeries {

  /** W1: k-step lag. */
  def lagK(c: Column, k: Int, w: WindowSpec): Column = lag(c, k).over(w)

  /** W2: next-row value (target/label construction). */
  def lead1(c: Column, w: WindowSpec): Column = lead(c, 1).over(w)

  /** W3/W11: simple moving average over a row frame [from, to].
    * Spark's window avg already averages however many rows exist in the
    * frame, matching pandas rolling(min_periods=1) semantics. */
  def sma(c: Column, w: WindowSpec, from: Int, to: Int): Column =
    avg(c).over(w.rowsBetween(from, to))

  /** Exact-decimal moving average for values with ≤2 decimal places:
    * sums integer cents (every partial sum is exact in IEEE double, so the
    * result is identical regardless of summation order or engine) and
    * divides by the frame count. Use for oracle-compared outputs — a plain
    * double avg differs between engines in the last ulp, which flips
    * rounding when the exact value lands on a rounding boundary. */
  def smaCents(c: Column, w: WindowSpec, from: Int, to: Int): Column = {
    val f = w.rowsBetween(from, to)
    sum(round(c * 100).cast("long")).over(f) / (count(c).over(f) * lit(100.0))
  }

  /** W4: rolling sample standard deviation ("volatility"). */
  def volatility(c: Column, w: WindowSpec, n: Int): Column =
    stddev_samp(c).over(w.rowsBetween(-n, -1))

  /** W6: absolute momentum over k rows. */
  def momentum(c: Column, k: Int, w: WindowSpec): Column = c - lag(c, k).over(w)

  /** W6: relative momentum (ratio to the k-lagged value, minus 1).
    * Zero lag → null (nullif guard): ANSI-mode Spark throws on x/0 while
    * DuckDB yields inf — null is the one value both engines agree on. */
  def momentumPct(c: Column, k: Int, w: WindowSpec): Column =
    c / nullif(lag(c, k).over(w), lit(0)) - lit(1)

  /** W5: RSI over n rows, current row excluded, epsilon-guarded.
    * gain_t = max(c_t - c_{t-1}, 0); loss_t = max(c_{t-1} - c_t, 0);
    * RSI = 100 - 100 / (1 + avg(gain)/(avg(loss)+1e-6)). */
  def rsi(c: Column, n: Int, w: WindowSpec): Column = {
    val diff = c - lag(c, 1).over(w)
    // Integer-cent gains/losses: the trailing averages are then exact and
    // engine-identical, making the ratio and the final RSI deterministic.
    val gainC = when(diff > 0, round(diff * 100).cast("long")).otherwise(lit(0L))
    val lossC = when(diff < 0, round(-diff * 100).cast("long")).otherwise(lit(0L))
    val f = w.rowsBetween(-n, -1)
    val avgGain = sum(gainC).over(f) / (count(gainC).over(f) * lit(100.0))
    val avgLoss = sum(lossC).over(f) / (count(lossC).over(f) * lit(100.0))
    lit(100.0) - lit(100.0) / (lit(1.0) + avgGain / (avgLoss + lit(1e-6)))
  }

  /** W8: MACD as the difference of the reference's two "EMAs" (actually
    * SMAs over [-12,0] and [-26,0] — see object Scaladoc). */
  def macd(c: Column, w: WindowSpec): Column =
    smaCents(c, w, -12, 0) - smaCents(c, w, -26, 0)

  /** W7: volume-spike flag: 1 when c exceeds `mult`× its trailing n-row
    * mean. The threshold is rounded to an exact decimal so the comparison
    * is engine-deterministic even at mathematical equality. */
  def spikeFlag(c: Column, n: Int, mult: Double, w: WindowSpec): Column =
    when(c > lit(mult) * smaCents(c, w, -n, -1), lit(1)).otherwise(lit(0))

  /** W9: forward fill — last non-null value up to the current row. */
  def ffill(c: Column, w: WindowSpec): Column =
    last(c, ignoreNulls = true).over(w.rowsBetween(Long.MinValue, 0))

  /** W10: first difference over the given window's order. */
  def diff1(c: Column, w: WindowSpec): Column = c - lag(c, 1).over(w)

  /** Percent change vs the previous row, in percent units (null when the
    * previous value is 0 — see momentumPct guard note). */
  def pctChange(c: Column, w: WindowSpec): Column =
    (c - lag(c, 1).over(w)) / nullif(lag(c, 1).over(w), lit(0)) * lit(100)

  /** Running (cumulative) sum. */
  def runningSum(c: Column, w: WindowSpec): Column =
    sum(c).over(w.rowsBetween(Long.MinValue, 0))

  /** Crossover signal: 1 while the fast SMA is above the slow SMA
    * (index.js:644-667's MA-crossover chart). Rounded before comparison
    * for cross-engine determinism. */
  def crossSignal(c: Column, w: WindowSpec, fast: Int, slow: Int): Column =
    when(smaCents(c, w, -fast, -1) > smaCents(c, w, -slow, -1), lit(1))
      .otherwise(lit(0))
}
