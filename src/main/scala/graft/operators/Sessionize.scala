package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts whenever the gap to the
  * key's previous event exceeds `gapNanos`. One window pass (lag + running
  * sum over the same spec — single shuffle + sort), the standard
  * event-analytics operator the reference's dashboard approximates with
  * client-side day grouping (index.js:517-542). */
object Sessionize {

  /** Adds a 0-based `session_idx` per key. `orderCols` must make the
    * per-key order total (pass the event id as tiebreaker). */
  def withSessionIdx(events: DataFrame, key: String, tsCol: String,
                     gapNanos: Long, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    val flag = when(
      col(tsCol) - lag(col(tsCol), 1).over(w) > gapNanos, 1).otherwise(0)
    events.withColumn("session_idx",
      sum(flag).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session summary: size, duration, first event. */
  def sessionSummary(events: DataFrame, key: String, tsCol: String,
                     gapNanos: Long, idCol: String): DataFrame =
    withSessionIdx(events, key, tsCol, gapNanos, Seq(col(tsCol), col(idCol)))
      .groupBy(col(key), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        max(col(tsCol)).as("__maxts"),
        min(col(tsCol)).as("__mints"),
        min(col(idCol)).as("first_event"))
      // integer `div`: a double division truncated to long can land one
      // short of the exact quotient on whole-second gaps
      .withColumn("duration_s", expr("(__maxts - __mints) div 1000000000"))
      .drop("__maxts", "__mints")
}
