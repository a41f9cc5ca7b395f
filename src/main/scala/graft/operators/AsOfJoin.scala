package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the right side's value
  * at the greatest right timestamp ≤ the left timestamp within the same
  * key — THE temporal-alignment operator of time-series engines (the
  * reference approximates it with lag() chains; SURVEY §2.3 notes the
  * absence).
  *
  * Implementation (SURVEY §7.3 path (a) — composed from built-ins, no
  * custom physical operator needed): tag and union both sides, then one
  * `last(value, ignoreNulls)` window per key ordered by (ts, side) —
  * right-before-left on timestamp ties so "at or equal" matches. This is
  * a single hash-partition shuffle + one sort over |L|+|R| rows: at
  * 100 TB it scales exactly like any windowed aggregation, with no
  * pairwise or range-join blowup, and inherits AQE skew handling.
  *
  * Right-side (key, ts) duplicates are pre-aggregated (max) so the result
  * is deterministic — mirroring DuckDB's ASOF JOIN requirement of a
  * unique right frame.
  */
object AsOfJoin {

  private val Reserved = Set("__k", "__ts", "__r", "__rv", "__payload")

  def asofBackward(left: DataFrame, right: DataFrame,
                   key: String, ts: String, rightVal: String,
                   outCol: String = "asof_value"): DataFrame = {
    val clash = (left.columns ++ right.columns).filter(Reserved) ++
      (if (Reserved(outCol)) Seq(outCol) else Nil)
    require(clash.isEmpty, s"asofBackward reserves column names ${Reserved.mkString(", ")}; " +
      s"rename: ${clash.distinct.mkString(", ")}")
    val rvType = right.schema(rightVal).dataType
    // The right value rides inside a single-field struct: the struct is
    // non-null for every right row even when the VALUE is null, so
    // last(_, ignoreNulls) matches the most recent right ROW (DuckDB/
    // pandas ASOF semantics) rather than skipping to an older non-null
    // value.
    val l2 = left.select(
      col(key).as("__k"), col(ts).as("__ts"),
      lit(0).as("__r"),
      lit(null).cast(s"struct<v:${rvType.sql}>").as("__rv"),
      struct(left.columns.map(col): _*).as("__payload"))
    val payloadType = l2.schema("__payload").dataType
    val r2 = right
      .groupBy(col(key).as("__k"), col(ts).as("__ts"))
      .agg(max(col(rightVal)).as("__v"))
      .select(col("__k"), col("__ts"), lit(1).as("__r"),
        struct(col("__v").as("v")).as("__rv"),
        lit(null).cast(payloadType).as("__payload"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts").asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn(outCol, last(col("__rv"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__r") === 0)
      .select((left.columns.map(c => col(s"__payload.$c")) :+ col(outCol)): _*)
  }
}
