package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit — the Deequ/Great-Expectations
  * pattern as plain relational plans: a check suite over a table evaluates
  * to one row per constraint `(target, check, column, metric, threshold,
  * passed)`, so a pipeline can gate a load on `passed` without collecting
  * anything but the bounded report.
  *
  * Three evaluation shapes, each the cheapest plan its constraint class
  * admits:
  *
  *  - [[scalarAudit]] — completeness / fraction-in-range / fraction-in-set
  *    / row-count checks all fold into ONE aggregate over one scan
  *    (constant-size count partials, map-side combined), unpivoted to a
  *    row per check by the Profile explode-of-structs idiom. Adding a
  *    check adds a column to the same aggregate, never a pass.
  *  - [[uniqueness]] — key-grain hash aggregate, then a metadata-scale
  *    rollup: distinct-keys / total-rows. The groupBy keeps per-key state
  *    bounded at the key grain (never a count(distinct) buffer per output
  *    row); at 100 TB this is the same shuffle a dedup already pays.
  *  - [[refIntegrity]] — orphaned-foreign-key fraction via LEFT ANTI join
  *    against the distinct parent keys: equi-join on the key, so AQE picks
  *    broadcast when the parent's key set is small and shuffle otherwise.
  *
  * Cross-engine parity: every metric is an exact integer-count rational
  * evaluated in one double division, so the oracle reproduces it
  * bit-for-bit; `passed` compares that double to a literal threshold.
  *
  * Empty-input semantics are FAIL CLOSED: on a zero-row frame every
  * fractional metric's denominator is guarded (`when(count > 0, …)`)
  * so it evaluates to NULL rather than throwing under ANSI division,
  * and `passed` maps a NULL metric to `false` — an empty
  * (failed-upstream) load can never silently certify completeness,
  * uniqueness, or referential integrity. Only `minRowCount` keeps a
  * non-NULL metric (0.0) on empty input, and it fails on its own
  * threshold.
  */
object Constraints {

  /** One scalar check: (check name, column label, aggregate metric
    * expression, pass threshold). The metric must be a single aggregate
    * expression over the audited frame. */
  final case class ScalarCheck(check: String, column: String,
                               metric: Column, threshold: Double)

  /** NULL unless the frame has rows — the fail-closed guard every
    * fractional metric shares (0/0 must become NULL→failed, not an
    * ANSI DIVIDE_BY_ZERO or a silently-passing NULL). */
  private def overRows(num: Column): Column =
    when(count(lit(1)) > 0L,
      num.cast("double") / count(lit(1)).cast("double"))

  /** Fraction of rows with `c` non-null. */
  def completeness(c: String, min: Double): ScalarCheck =
    ScalarCheck("completeness", c, overRows(count(col(c))), min)

  /** Fraction of rows with `c` inside [lo, hi] (inclusive; NULL counts
    * as outside). `label` distinguishes two range checks on one column
    * in the report (it is also the report's sort key). */
  def fractionInRange(c: String, lo: Double, hi: Double, min: Double,
                      label: String = null): ScalarCheck =
    ScalarCheck("in_range", if (label == null) c else label,
      overRows(sum(when(col(c) >= lo && col(c) <= hi, 1L).otherwise(0L))), min)

  /** Fraction of rows whose `c` is one of `values`. */
  def fractionInSet(c: String, values: Seq[String], min: Double): ScalarCheck =
    ScalarCheck("in_set", c,
      overRows(sum(when(col(c).isin(values: _*), 1L).otherwise(0L))), min)

  /** Row count as a metric (threshold = minimum rows). */
  def minRowCount(min: Double): ScalarCheck =
    ScalarCheck("row_count", "*", count(lit(1)).cast("double"), min)

  /** Evaluate all scalar checks in ONE aggregation pass over `df`. */
  def scalarAudit(df: DataFrame, target: String,
                  checks: Seq[ScalarCheck]): DataFrame = {
    require(checks.nonEmpty, "scalarAudit: at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) => c.metric.as(s"__m$i") }
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(target).as("target"), lit(c.check).as("check"),
        lit(c.column).as("column"), col(s"__m$i").as("metric"),
        lit(c.threshold).as("threshold"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
      .withColumn("passed",
        coalesce(col("metric") >= col("threshold"), lit(false)))
  }

  /** Key-uniqueness check: NON-NULL distinct keys / total rows, passes
    * only at exactly 1.0 (every row carries a key and every key occurs
    * once). A row with any NULL key component counts against the
    * metric rather than forming its own "unique" NULL group — the
    * `count(DISTINCT k) / count(*)` semantics a SQL twin states, and
    * the Deequ-style reading that a missing key can never certify
    * uniqueness. */
  def uniqueness(df: DataFrame, target: String, cols: Seq[String]): DataFrame = {
    val keyed = cols.map(col(_).isNotNull).reduce(_ && _)
    val keys = df.filter(keyed)
      .groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("keys"))
    val total = df.agg(count(lit(1)).as("rows"))
    keys.crossJoin(broadcast(total))
      .select(lit(target).as("target"), lit("unique").as("check"),
        lit(cols.mkString(",")).as("column"),
        when(col("rows") > 0L,
          col("keys").cast("double") / col("rows").cast("double"))
          .as("metric"),
        lit(1.0).as("threshold"))
      .withColumn("passed",
        coalesce(col("metric") >= col("threshold"), lit(false)))
  }

  /** Referential-integrity check: fraction of child rows whose `childCol`
    * exists in the parent's `parentCol` key set. NULL foreign keys count
    * as orphans (they reference nothing). */
  def refIntegrity(child: DataFrame, childCol: String, childName: String,
                   parent: DataFrame, parentCol: String,
                   min: Double = 1.0): DataFrame = {
    val total = child.agg(count(lit(1)).as("rows"))
    val orphans = child.select(col(childCol))
      .join(parent.select(col(parentCol).as(childCol)).distinct(),
        Seq(childCol), "left_anti")
      .agg(count(lit(1)).as("orph"))
    orphans.crossJoin(broadcast(total))
      .select(lit(childName).as("target"), lit("ref_integrity").as("check"),
        lit(childCol).as("column"),
        when(col("rows") > 0L,
          lit(1.0) - col("orph").cast("double") / col("rows").cast("double"))
          .as("metric"),
        lit(min).as("threshold"))
      .withColumn("passed",
        coalesce(col("metric") >= col("threshold"), lit(false)))
  }
}
