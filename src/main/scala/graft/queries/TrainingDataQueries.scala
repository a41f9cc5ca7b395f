package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.hash32

/** Deterministic sampling/splitting for training-data assembly — the
  * operations that turn a landed corpus into a training mix:
  *
  *  - stratified downsampling (keep over-represented strata at a
  *    fraction), hash-based so the SAME rows survive on every engine,
  *    every run, every retry — `rand()` sampling is not reproducible
  *    across task retries and cannot be oracle-checked;
  *  - leakage-safe train/val/test splits keyed by ENTITY (all of a
  *    user's rows land in one split — row-level splits leak a user's
  *    behaviour across train and eval).
  *
  * Both are pure map-side expressions over md5 (the shared cross-engine
  * hash): no shuffle except the final presentation aggregate, scan-
  * parallel at any corpus size.
  */
object TrainingDataQueries {

  /** hash32 of (id | salt) — uniform in [0, 2^32); the salt decouples
    * independent sampling decisions on the same key. */
  private def saltedHash(c: Column, salt: String): Column =
    hash32(concat(c.cast("string"), lit("|" + salt)))

  private val Two32 = 4294967296L

  val SampleRates: Seq[(String, Double)] = Seq(
    "click" -> 0.5, "error" -> 0.25, "purchase" -> 1.0,
    "signup" -> 1.0, "view" -> 0.1)

  /** Per-stratum deterministic sampling: a row survives iff
    * hash32(event_id|salt) < rate(event_type)·2^32. Presentation output
    * is the per-stratum count + id-range fingerprint. */
  def qStratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rate = SampleRates.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col("event_type") === k, lit(v)).otherwise(acc)
    }
    Tables.events(spark, dir)
      .filter(saltedHash(col("event_id"), "strat") < rate * lit(Two32))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sampled"),
        min("event_id").as("first_id"), max("event_id").as("last_id"))
      .orderBy("event_type")
  }

  /** Entity-keyed 80/10/10 split: hash32(user_id|salt) mod 100 buckets →
    * train/val/test; every event of a user lands in ONE split. */
  def qHashSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = saltedHash(col("user_id"), "split") % 100
    Tables.events(spark, dir)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"))
      .orderBy("split")
  }

  /** Sequence packing (concat-and-chunk): documents in a stable order
    * are packed into contiguous training bins of ~`budget` tokens by
    * bucketing the running token count — the distributed analog of the
    * greedy packer every LLM data pipeline runs before tokenized-batch
    * writing. One window cumsum (per-source partition) + one aggregate;
    * a doc straddling a boundary starts the next bin (no splitting).
    * SCALE NOTE: the prefix sum serializes per source by definition —
    * at 100 TB pack per (source, shard) with shards cut by an id range,
    * which only perturbs bin boundaries at shard edges. */
  def qSeqPacking(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextFunctions.tokenCount
    val budget = 2048L
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("cum", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("bin", expr(s"cum div $budget")) // div: exact integer quotient
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("total_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("source", "bin")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stratified_sample" -> qStratifiedSample _,
    "q_hash_split" -> qHashSplit _,
    "q_seq_packing" -> qSeqPacking _,
  )

  private def hSql(expr: String, salt: String) =
    s"('0x' || substr(md5(CAST($expr AS VARCHAR) || '|$salt'), 1, 8))::BIGINT"

  val oracles: Map[String, String] = Map(
    "q_stratified_sample" -> {
      val rateCase = "CASE event_type " +
        SampleRates.map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ") +
        " ELSE 0.0 END"
      s"""SELECT event_type, count(*) AS n_sampled,
         |  min(event_id) AS first_id, max(event_id) AS last_id
         |FROM events
         |WHERE ${hSql("event_id", "strat")} < ($rateCase) * $Two32
         |GROUP BY event_type ORDER BY event_type""".stripMargin
    },
    "q_hash_split" ->
      s"""SELECT CASE WHEN ${hSql("user_id", "split")} % 100 < 80 THEN 'train'
         |            WHEN ${hSql("user_id", "split")} % 100 < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |  count(*) AS n_events, count(DISTINCT user_id) AS n_users
         |FROM events GROUP BY 1 ORDER BY split""".stripMargin,
    "q_seq_packing" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, n_tok,
        |    coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM t)
        |SELECT source, cum // 2048 AS bin, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2 ORDER BY source, bin""".stripMargin,
  )
}
