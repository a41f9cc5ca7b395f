package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic reference-shaped fixtures (FIXTURES.md §A): the CSE
  * price panel (combined_daily_data.csv shape) and fundamentals dimension
  * (outputNew_cleaned2.csv shape), generated in-plan — no files, no
  * randomness, reproducible everywhere.
  *
  * Coverage requirements from FIXTURES.md §A1/A2: ≥2 symbols × ≥30
  * consecutive trading days (26-row windows + lag-7 + lead-1 need ≥28),
  * one symbol with <14 rows (short-partition edge), a null-price run
  * (forward-fill W9), fundamentals rows with zero revenue (division
  * guard F17), symbols on one side only (left-join nulls, whitelist
  * drops). */
object ReferenceFixtures {

  /** symbol, date, price, sharevolume, percentageChange — 3 long symbols
    * × 40 days, 1 short symbol × 5 days, nulls on AAA days 10-12. */
  def pricePanel(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val longSyms = Seq("AAA.N0000", "BBB.N0000", "CCC.N0000")
    val rows = for {
      (sym, si) <- (longSyms :+ "DDD.N0000").zipWithIndex
      days = if (sym == "DDD.N0000") 5 else 40
      d <- 0 until days
    } yield {
      // deterministic pseudo-price: base + sym offset + wave; 2 decimals
      val base = 100.0 + si * 50
      val price = math.floor((base + 7 * math.sin(d * 0.7 + si) + d * 0.3) * 100) / 100
      val nullRun = sym == "AAA.N0000" && d >= 10 && d <= 12
      (sym, f"2023${1 + d / 28}%02d${1 + d % 28}%02d.csv",
        if (nullRun) None else Some(price),
        (1000 + 37 * ((d * (si + 3)) % 17)).toLong,
        math.floor(math.sin(d + si) * 500) / 100)
    }
    rows.toDF("symbol", "Date", "price", "sharevolume", "percentageChange")
      .withColumn("date", Sources.parseDateFromCsvName(col("Date")))
  }

  /** Symbol, Quarter, Total_Revenue, Net_Income, Basic_EPS — includes a
    * zero-revenue row and a symbol absent from the panel. */
  def fundamentals(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("AAA.N0000", "Q4", 41.77e9, 2.1e9, 12.5),
      ("BBB.N0000", "Q4", 0.0, -5.0e8, -1.2),   // zero revenue: F17 guard
      ("DDD.N0000", "Q3", 5.28e9, 9.0e8, 3.3),
      ("ZZZ.N0000", "Q4", 1.0e9, 1.0e8, 0.9)    // not in panel
      // CCC.N0000 intentionally missing: left-join null path
    ).toDF("Symbol", "Quarter", "Total_Revenue", "Net_Income", "Basic_EPS")
      .withColumnRenamed("Symbol", "symbol")
  }
}
