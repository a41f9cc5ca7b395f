package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable previous-row lookup over a GLOBAL (ts, id) order — the
  * stitch that closes SCALE.md's q_diff_global limit ("total-order
  * sort, single merge point") for lag-shaped windows.
  *
  * The [[SaltedWindow]] philosophy applied to ordering instead of
  * framing: rows are chunked by value-based time buckets (`ts div
  * chunkSpan` — deterministic, no sampled range boundaries), the lag
  * runs PARTITIONED by chunk (parallel across the cluster, each chunk a
  * plain in-memory window), and only each chunk's LAST row — one row
  * per non-empty chunk — crosses chunk boundaries: a per-chunk max_by
  * aggregate, lagged over the chunk order, joined back, fills the one
  * row per chunk whose in-chunk lag is null. The unpartitioned window
  * in that carry step orders CHUNK COUNT rows (metadata scale: a year
  * of hourly chunks is 8.8k rows at ANY corpus size), not the corpus.
  *
  * Identical-by-construction to the total-order lag: within a chunk the
  * orders agree; across the boundary the previous global row IS the
  * previous non-empty chunk's max_by-(ts, id) row. q_diff_chunked pins
  * the equality through q_diff_global's own DuckDB oracle, and
  * TimeSeriesSpec asserts frame equality on the fixture. */
object ChunkedOrder {

  /** `df` plus `prevCol` = the previous value of `valCol` under the
    * global (`tsCol`, `idCol`) order (null for the globally first row).
    * `tsCol` must be an integral epoch column; `chunkSpan` is in the
    * same unit and only affects parallelism, never the result. */
  def withGlobalPrev(df: DataFrame, tsCol: String, idCol: String, valCol: String,
                     prevCol: String, chunkSpan: Long): DataFrame = {
    require(chunkSpan > 0, "withGlobalPrev: chunkSpan must be positive")
    val reserved = Seq("__chunk", "__prev_in", "__first", "__last", "__carry")
    require(!df.columns.exists(reserved.contains),
      s"withGlobalPrev: input must not carry ${reserved.mkString(", ")}")
    // integer chunking: ts spans exceed 2^53 in nanos, so the bucket
    // must be computed in long arithmetic (a double division would
    // collapse distinct buckets), and `div` floors toward -inf stays
    // irrelevant for epoch-positive ts
    val chunk = expr(s"`$tsCol` div ${chunkSpan}L")
    val wc = Window.partitionBy("__chunk").orderBy(col(tsCol), col(idCol))
    // the carry applies ONLY to each chunk's first row (review r10
    // find: coalescing on "in-chunk lag is null" also fired for rows
    // whose true predecessor VALUE is null, substituting the carry for
    // a legitimate null prev) — so the first-row test is positional
    val withIn = df.withColumn("__chunk", chunk)
      .withColumn("__prev_in", lag(col(valCol), 1).over(wc))
      .withColumn("__first", row_number().over(wc) === 1)
    // max_by would skip a null last VALUE (nulls sort nowhere in agg
    // buffers); carrying the (ts, id, value) struct keeps a null value
    // attached to the genuinely-last row
    val lasts = df.withColumn("__chunk", chunk)
      .groupBy("__chunk")
      .agg(max(struct(col(tsCol), col(idCol), col(valCol).as("__v"))).as("__last"))
    // one row per NON-EMPTY chunk: lag(1) over the chunk order is the
    // previous non-empty chunk's last value — the only unpartitioned
    // window here, over chunk-count rows
    val carry = lasts
      .withColumn("__carry", lag(col("__last.__v"), 1).over(Window.orderBy("__chunk")))
      .select(col("__chunk"), col("__carry"))
    withIn.join(carry, Seq("__chunk"), "left")
      .withColumn(prevCol, when(col("__first"), col("__carry")).otherwise(col("__prev_in")))
      .drop("__chunk", "__prev_in", "__first", "__carry")
  }

  /** Global `row_number()` without a total-order window — the same
    * stitch for rank-shaped globals (closes the q_pagination half of
    * the SCALE.md limit): row_number runs PARTITIONED by `chunkCol`,
    * and each chunk's global offset is the running sum of prior-chunk
    * counts — a window over chunk-count rows, metadata scale.
    *
    * Caller contract (cannot be checked cheaply, so it is stated):
    * `chunkCol` must be a function of the LEADING order expression that
    * is monotone non-decreasing along the global `orderCols` order —
    * e.g. `floor(-c)` for `ORDER BY c DESC` — so the global sort never
    * interleaves two chunks and equal leading keys share a chunk.
    *
    * `rnCol` is cast to int for schema parity with `row_number()`; a
    * corpus past 2^31 rows needs the long form (and has no business
    * offset-paging that deep — keyset paging is the scale answer). */
  def withGlobalRowNumber(df: DataFrame, chunkCol: Column, orderCols: Seq[Column],
                          rnCol: String): DataFrame = {
    val reserved = Seq("__chunk", "__rn_in", "__cnt", "__offset")
    require(!df.columns.exists(reserved.contains),
      s"withGlobalRowNumber: input must not carry ${reserved.mkString(", ")}")
    val withChunk = df.withColumn("__chunk", chunkCol)
    val rnIn = withChunk.withColumn("__rn_in",
      row_number().over(Window.partitionBy("__chunk").orderBy(orderCols: _*)))
    // NULL chunk (= NULL leading order key) sorts LAST, matching the
    // desc / asc_nulls_last orders this operator serves — Spark's asc
    // default is NULLS FIRST, which silently offset every real chunk
    // by the NULL-key row count (hostile sweep r18: one NULL-balance
    // customer shifted the whole page by one rank). The offsets join
    // is null-safe for the same reason: a null-rejecting key join
    // left the NULL-chunk rows with a NULL global rank.
    val offsets = withChunk.groupBy("__chunk").agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset", coalesce(
        sum(col("__cnt")).over(
          Window.orderBy(col("__chunk").asc_nulls_last)
            .rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select(col("__chunk").as("__chunk_o"), col("__offset"))
    rnIn.join(offsets, col("__chunk") <=> col("__chunk_o"), "left")
      .withColumn(rnCol, (col("__offset") + col("__rn_in")).cast("int"))
      .drop("__chunk", "__chunk_o", "__rn_in", "__offset")
  }
}
