package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal band join: pairs (l, r) with the same key whose timestamps
  * lie within `tol` of each other (|l.ts − r.ts| ≤ tol) — the
  * sensor-alignment / event-correlation join (e.g. "purchases within an
  * hour of an error by the same user").
  *
  * Written naively (`abs(lts − rts) <= tol` as the join condition on top
  * of the key equality) Spark evaluates the band as a post-join filter of
  * the key equi-join — fine until one key is hot. This operator buckets
  * both sides by `floor(ts / tol)`; a qualifying pair's buckets differ by
  * at most 1, so the LEFT side explodes to its bucket ±1 and the join is
  * an EQUI-join on (key, bucket), then the exact band predicate filters.
  * The shuffle key gains time locality — a hot entity spreads over
  * history/tol buckets instead of one reducer — and the pair workload per
  * task is bounded by events-per-(key, 3·tol window), not per key.
  */
object BandJoin {

  def bandJoin(left: DataFrame, right: DataFrame,
               key: String, lts: String, rts: String, tol: Long): DataFrame = {
    require(tol > 0, "tolerance must be positive")
    val clash = (left.columns ++ right.columns).filter(Set("__b0", "__bucket"))
    require(clash.isEmpty, s"bandJoin reserves __b0/__bucket; rename: ${clash.distinct.mkString(", ")}")
    val lb = left
      .withColumn("__b0", TimeBuckets.floorDiv(lts, tol))
      .withColumn("__bucket", explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val rb = right.withColumn("__bucket", TimeBuckets.floorDiv(rts, tol))
    lb.join(rb, Seq(key, "__bucket"))
      .filter(abs(col(lts) - col(rts)) <= tol)
      .drop("__bucket")
  }
}
