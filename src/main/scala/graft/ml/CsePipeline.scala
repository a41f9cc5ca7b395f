package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TimeSeries

/** The reference's stock pipeline, feature-for-feature (SURVEY §3.1): the
  * exact windowed feature block of regression.py:80-128 / classifier.py:
  * 22-41, the fundamentals join (J1), the financial ratios (F12), the
  * target/label construction (W2), the null audit (A1), and the last-14-
  * days temporal split (M13) — so a user of the reference can run their
  * training pipeline on this engine by calling one function.
  *
  * Quirks preserved on purpose (SURVEY §7.4.1, each pinned by
  * CsePipelineSpec):
  *  - "ema12"/"ema26" are SMAs over [-12,0]/[-26,0] (regression.py:112-114);
  *  - volatility14 is SAMPLE stddev over [-14,-1] (pandas ddof=1);
  *  - RSI-14 excludes the current row and ε-guards the loss (1e-6);
  *  - training-side semantics are canonical where the reference's pandas
  *    serving path drifts (SURVEY §7.4.2).
  * All features share one WindowSpec → single shuffle + sort.
  */
object CsePipeline {

  private def w = Window.partitionBy("symbol").orderBy("date")

  /** regression.py:80-128 — the full feature block. */
  def features(panel: DataFrame): DataFrame = {
    val p = col("price")
    panel
      .withColumn("lag_1", lag(p, 1).over(w))
      .withColumn("lag_2", lag(p, 2).over(w))
      .withColumn("lag_3", lag(p, 3).over(w))
      .withColumn("lag_5", lag(p, 5).over(w))
      .withColumn("lag_7", lag(p, 7).over(w))
      .withColumn("ma5", TimeSeries.sma(p, w, -5, -1))
      .withColumn("ma10", TimeSeries.sma(p, w, -10, -1))
      .withColumn("momentum_3", TimeSeries.momentum(p, 3, w))
      .withColumn("momentum_5", TimeSeries.momentumPct(p, 5, w))
      .withColumn("volatility14", TimeSeries.volatility(p, w, 14))
      .withColumn("vol_ma5", TimeSeries.sma(col("sharevolume"), w, -5, -1))
      .withColumn("volume_spike",
        when(col("sharevolume") > lit(1.5) * col("vol_ma5"), 1).otherwise(0))
      .withColumn("rsi14", TimeSeries.rsi(p, 14, w))
      .withColumn("ema12", TimeSeries.sma(p, w, -12, 0))  // reference's "EMA" is an SMA
      .withColumn("ema26", TimeSeries.sma(p, w, -26, 0))
      .withColumn("macd", col("ema12") - col("ema26"))
      .withColumn("price_ffill", TimeSeries.ffill(p, w))  // classifier.py:39-41
      .withColumn("next_price", lead(p, 1).over(w))
      .withColumn("target",
        when(col("next_price").isNotNull && p.isNotNull && !isnan(p) && p =!= 0,
          (col("next_price") - p) / p))
      .withColumn("label", when(col("next_price") > p, 1).otherwise(0))
  }

  /** regression.py:130,138-145 — left join fundamentals + ratio features
    * with the ε division guard (F17) and lit(0.0) macro placeholders (F18). */
  def withFundamentals(featured: DataFrame, fundamentals: DataFrame): DataFrame =
    featured
      .join(broadcast(fundamentals), Seq("symbol"), "left")
      .na.fill(0.0, Seq("Total_Revenue", "Net_Income", "Basic_EPS"))
      .withColumn("profit_margin",
        col("Net_Income") / (col("Total_Revenue") + lit(1e-6)))
      .withColumn("pe_proxy", col("price") / (col("Basic_EPS") + lit(1e-6)))
      .withColumn("yield_10y", lit(0.0))
      .withColumn("vix", lit(0.0))

  /** regression.py:58-72 — the schema-driven null audit. */
  def nullAudit(df: DataFrame): DataFrame = {
    val audits: Seq[Column] = df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      val isMissing = f.dataType match {
        case org.apache.spark.sql.types.DoubleType => c.isNull || isnan(c)
        case _ => c.isNull
      }
      count(when(isMissing, 1)).as(f.name)
    }
    df.agg(audits.head, audits.tail: _*)
  }

  /** regression.py:182-186 — drop unusable targets. */
  def filterTrainable(df: DataFrame): DataFrame =
    df.filter(col("target").isNotNull && !isnan(col("target")) && col("target") =!= 0)

  /** regression.py:216-218 — split at max(date) − 14 days, in-plan. */
  def temporalSplit14(df: DataFrame): (DataFrame, DataFrame) = {
    val cutoff = df.agg(date_sub(max(col("date")), 14).as("cutoff"))
    val tagged = df.crossJoin(broadcast(cutoff))
    (tagged.filter(col("date") < col("cutoff")).drop("cutoff"),
      tagged.filter(col("date") >= col("cutoff")).drop("cutoff"))
  }
}
