package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build + probe for scan-side prefilters.
  *
  * The probe compiles to Spark's own codegen'd
  * [[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
  * (the expression behind runtime row-level filtering), with the filter
  * bytes inlined as a binary literal — so a probe is a few ns of hashing
  * against task-local bits, cheaper than probing a broadcast hash
  * relation and available even where no join exists to attach it to.
  *
  * 100 TB shape: the filter is built ONCE over the small side (an eval
  * suite's n-grams, a blocklist, yesterday's fingerprints), serialized
  * into the plan, and applied map-side at the scan, so the expensive
  * downstream operator (join, groupBy) sees only probable matches. A
  * bloom filter has NO false negatives, so `prefilter → exact verify`
  * keeps exact semantics while the shuffle/probe volume drops to the
  * true-match rate plus fpp.
  */
object BloomFunctions {

  /** Build a bloom filter over a LONG column of `df` (driver-held, like
    * a broadcast dim — size is O(expectedItems), independent of corpus
    * size). Uses the public `DataFrameStatFunctions.bloomFilter`
    * aggregation: one distributed pass, filters merged tree-wise. */
  def buildLongBloom(df: DataFrame, colName: String,
                     expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    df.stat.bloomFilter(colName, math.max(expectedItems, 1L), fpp)

  /** Serialize a bloom filter to the byte form
    * [[BloomFilterMightContain]] deserializes (both sides are
    * org.apache.spark.util.sketch.BloomFilter stream format). */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Predicate column: does the bloom possibly contain the LONG value?
    * `value` must be a LongType column (hash wide values with
    * xxhash64() — the same hash family stat.bloomFilter uses for
    * longs is the identity put, so build and probe must agree on the
    * hashed representation). False positives pass (verify after);
    * false negatives cannot happen. */
  def mightContainLong(bloomBytes: Array[Byte], value: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      GraftBridge.expression(lit(bloomBytes)),
      GraftBridge.expression(value)))
}
