package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Salted time-range windows for hot keys (SCALE.md documented limit #2).
  *
  * A per-entity rolling window puts each entity's ENTIRE history in one
  * task — a pathological key (one user emitting 1% of a 100 TB stream)
  * serializes through a single core regardless of cluster size. Salting
  * by time chunk restores parallelism for RANGE frames:
  *
  *  1. assign each row a chunk id (`floor(ts / chunk)`), so the window
  *     partition key becomes (entity, chunk) — a hot entity fans out
  *     over history/chunk tasks;
  *  2. frame-stitch at the boundaries: every row within `frame` of a
  *     chunk's end is REPLICATED into the next chunk as carry-only
  *     context, so early rows of chunk c+1 still see their full
  *     [ts−frame, ts] window;
  *  3. compute the frame inside each (entity, chunk) partition and drop
  *     the carries.
  *
  * Requires frame ≤ chunk (carries then come only from the immediately
  * preceding chunk). The result is EXACTLY the unsalted window
  * (TemporalOpsSpec asserts equality on a skewed fixture); the cost is
  * replicating a frame-width sliver of rows per chunk boundary. Row-count
  * frames (ROWS BETWEEN) cannot be stitched this way — counting rows
  * across a boundary already requires the global order — which is why the
  * salted form is defined for time-RANGE frames.
  */
object SaltedWindow {

  /** Rolling sum of `valCol` over the RANGE frame [ts−frame, ts] per
    * `key`, computed with (key, chunk) parallelism. `ts` must be a
    * numeric (epoch-nano) column; `frameNs`/`chunkNs` in the same unit. */
  def saltedRollingSum(df: DataFrame, key: String, ts: String, valCol: String,
                       frameNs: Long, chunkNs: Long,
                       out: String = "rolling_sum"): DataFrame = {
    require(frameNs <= chunkNs, "frame must not exceed the chunk length")
    val clash = df.columns.filter(Set("__a", "__chunk", "__carry"))
    require(clash.isEmpty, s"saltedRollingSum reserves __a/__chunk/__carry; rename: ${clash.mkString(", ")}")
    // ONE scan: each row explodes to its own chunk plus (iff it lies
    // within `frame` of the chunk end) a carry copy in the next chunk —
    // a union of two filtered projections would read the source twice.
    val home = TimeBuckets.floorDiv(ts, chunkNs)
    val assignment = when(
      col(ts) >= (home + 1) * lit(chunkNs) - lit(frameNs),
      array(struct(home.as("chunk"), lit(0).as("carry")),
        struct((home + 1).as("chunk"), lit(1).as("carry"))))
      .otherwise(array(struct(home.as("chunk"), lit(0).as("carry"))))
    val all = df.select(df.columns.toIndexedSeq.map(col) :+ explode(assignment).as("__a"): _*)
      .select(df.columns.toIndexedSeq.map(col) :+ col("__a.chunk").as("__chunk") :+ col("__a.carry").as("__carry"): _*)
    val w = Window.partitionBy(col(key), col("__chunk")).orderBy(col(ts))
      .rangeBetween(-frameNs, 0)
    all
      .withColumn(out, sum(col(valCol)).over(w))
      .filter(col("__carry") === 0)
      .drop("__chunk", "__carry")
  }

  /** Unsalted reference form — the semantic spec for
    * [[saltedRollingSum]]; one partition per key. */
  def rollingSum(df: DataFrame, key: String, ts: String, valCol: String,
                 frameNs: Long, out: String = "rolling_sum"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts))
      .rangeBetween(-frameNs, 0)
    df.withColumn(out, sum(col(valCol)).over(w))
  }
}
