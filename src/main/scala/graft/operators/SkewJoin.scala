package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY scale concern: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * is the deterministic fallback when one key dominates so heavily that
  * even split partitions overwhelm an executor (the classic power-law
  * user_id at 100 TB). Left rows are salted by a uniform deterministic
  * hash of the whole row (md5-derived — stable across retries, unlike
  * rand()/monotonically_increasing_id); the right side is replicated
  * `buckets` times, so the shuffle key (key, salt) spreads one hot key
  * over `buckets` reducers. Result is exactly the plain inner join.
  */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame,
                      key: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    // salt from a deterministic hash over all left columns
    val saltSrc = md5(concat_ws("", left.columns.toIndexedSeq.map(c => col(c).cast("string")): _*))
    val l = left.withColumn("__salt",
      pmod(conv(substring(saltSrc, 1, 8), 16, 10).cast("long"), lit(buckets)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
