package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Scd2

/** Streaming face of [[Scd2.merge]]: maintain an SCD2 history table
  * from a CDC change stream (the firebasedb.py upsert feed, history-
  * preserving), one micro-batch = one merge.
  *
  * Layout: the history table lives under `tablePath` as VERSIONED
  * snapshots (`v=<batchId>` partitions). Each batch reads the latest
  * snapshot with version < its own batchId, collapses the micro-batch
  * to one change per key (last per `seqCol` wins — CDC sources always
  * carry an offset/ts; `foreachBatch` hands over an unordered bag),
  * merges, and overwrites exactly its own version partition (dynamic
  * partition overwrite — the [[Ingest.startIngest]] replay discipline).
  *
  * Crash-replay safety is DOUBLE-walled: the snapshot read is pinned
  * strictly below the replaying batch's id, so a replay merges against
  * exactly the pre-batch state; and even a merge against an
  * already-applied state is a pure pass-through ([[Scd2.merge]]'s
  * attribute-identical no-op, pinned by Scd2Spec's idempotence test).
  *
  * Scale notes: a dimension is small next to its facts — a full
  * snapshot rewrite per micro-batch is the honest cost of keeping the
  * history queryable as plain parquet (the same trade a MERGE INTO on
  * a table format makes internally, minus the log). Old versions are
  * pruned past `keepVersions`; readers pick the max `v=` partition
  * (partition pruning makes that a metadata decision). */
object Scd2Stream {

  /** Latest committed snapshot strictly below `beforeVersion`
    * (Long.MaxValue = newest overall — the reader's entry point). */
  def latestSnapshot(spark: SparkSession, tablePath: String,
                     beforeVersion: Long = Long.MaxValue): Option[DataFrame] = {
    val versions = listVersions(spark, tablePath).filter(_ < beforeVersion)
    if (versions.isEmpty) None
    else Some(spark.read.parquet(s"$tablePath/v=${versions.max}"))
  }

  private def listVersions(spark: SparkSession, tablePath: String): Seq[Long] = {
    val p = new Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
  }

  /** Start the maintainer. `changes` must carry the key columns, the
    * tracked attributes, and `seqCol` (intra-batch recency; dropped
    * before the merge). `initial` seeds batch 0's merge base and must
    * already be SCD2-shaped (valid_from/valid_to/is_current).
    * `batchDateOf` maps batchId → the batch's effective date column —
    * injectable so tests (and backfills) get deterministic validity
    * dates instead of wall-clock `current_date()`. */
  def startMerge(changes: DataFrame, tablePath: String, keyCols: Seq[String],
                 seqCol: String, initial: DataFrame,
                 checkpoint: String = "",
                 trigger: Trigger = Trigger.ProcessingTime("5 minutes"),
                 batchDateOf: Long => Column = _ => current_date(),
                 keepVersions: Int = 2): StreamingQuery = {
    // the crash-replay wall NEEDS the previous snapshot on disk: a
    // replaying batch N reads the latest version < N, and with only
    // one retained version a crash between the v=N write and the
    // checkpoint commit would leave the replay nothing but `initial`
    // to merge against — silent history reset (review r10 find)
    require(keepVersions >= 2,
      s"startMerge: keepVersions must be >= 2 (got $keepVersions) — " +
        "retaining a single snapshot breaks crash-replay recovery")
    changes.writeStream
      .outputMode("append")
      .option("checkpointLocation",
        if (checkpoint.nonEmpty) checkpoint else s"${tablePath}_ckpt")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val keys = keyCols.map(col)
        val attrs = batch.columns.toSeq.filterNot(keyCols.contains).filterNot(_ == seqCol)
        // last change per key wins inside the micro-batch (max_by on
        // the CDC sequence — deterministic when (key, seq) is unique,
        // which an offset-bearing source guarantees)
        val latest = batch
          .groupBy(keys: _*)
          .agg(max_by(struct(attrs.map(col): _*), col(seqCol)).as("__last"))
          .select(keys ++ attrs.map(a => col(s"__last.$a").as(a)): _*)
        val base = latestSnapshot(spark, tablePath, beforeVersion = batchId)
          .getOrElse(initial)
        Scd2.merge(base, latest, keyCols, batchDateOf(batchId))
          .withColumn("v", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("v")
          .parquet(tablePath)
        // retention: drop snapshots older than the newest `keepVersions`
        val stale = listVersions(spark, tablePath).sorted.dropRight(keepVersions)
        if (stale.nonEmpty) {
          val p = new Path(tablePath)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          stale.foreach(v => fs.delete(new Path(s"$tablePath/v=$v"), true))
        }
        ()
      }
      .start()
  }
}
