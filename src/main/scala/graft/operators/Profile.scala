package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiler — the engine's `pandas.describe()` surface (the
  * reference's EDA entry point before every model fit: ml_impl.py /
  * regression.py eyeball mean/spread/quartiles and null counts, then
  * dropna/fillna on what they see — classifier.py:44-49,
  * ml_impl.py:38-40).
  *
  * ONE aggregation pass over the input computes, per requested column:
  * non-null count, null count, mean, sample std, min/max, and the
  * exact interpolated quartiles; the single wide result row is then
  * unpivoted to one row per column through an explode of structs
  * (driver never sees data, output cardinality = |cols|).
  *
  * Scale shape: count/avg/stddev/min/max are constant-size map-side
  * partials. The exact `percentile` keeps per-partition value buffers —
  * the honest cost of describe()'s exact quartiles, bounded by ONE
  * column-set pass, not one job per column (pandas' model); a 100 TB
  * profile that can tolerate rank error swaps in `percentile_approx`
  * (the q_sketch_lean trade) without changing the output schema. */
object Profile {

  def describeNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "describeNumeric: at least one column")
    val aggs = count(lit(1)).as("__total") +: cols.flatMap { c =>
      val d = col(c).cast("double")
      Seq(
        count(d).as(s"__${c}_n"),
        avg(d).as(s"__${c}_mean"),
        stddev_samp(d).as(s"__${c}_std"),
        min(d).as(s"__${c}_min"),
        max(d).as(s"__${c}_max"),
        expr(s"percentile(CAST(`$c` AS DOUBLE), array(0.25D, 0.5D, 0.75D))")
          .as(s"__${c}_q"))
    }
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col(s"__${c}_n").as("n"),
        (col("__total") - col(s"__${c}_n")).as("n_null"),
        col(s"__${c}_mean").as("mean"),
        col(s"__${c}_std").as("std"),
        col(s"__${c}_min").as("min_v"),
        col(s"__${c}_max").as("max_v"),
        col(s"__${c}_q").getItem(0).as("p25"),
        col(s"__${c}_q").getItem(1).as("p50"),
        col(s"__${c}_q").getItem(2).as("p75"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(entries: _*)).as("__p"))
      .select(col("__p.*"))
  }
}
