package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Dedup

/** Streaming face of the bucketed incremental-dedup index: classify a
  * document STREAM against a standing corpus artifact
  * ([[Dedup.writeCorpusIndex]]) as it arrives, instead of re-running the
  * batch probe on a cron.
  *
  * Each micro-batch runs the exact batch classifier
  * ([[Dedup.incrementalDedupIndexed]]) — same candidates, same verify
  * join, same output schema, so stream and batch classifications cannot
  * drift — and lands in `outPath` partitioned by batch_id with dynamic
  * partition overwrite (the [[Ingest.startIngest]] replay-idempotency
  * discipline: a crash-replayed batch overwrites exactly its own
  * partition).
  *
  * Semantics at the stream boundary, stated honestly:
  *  - classification is batch-vs-CORPUS: two copies of a brand-new doc
  *    inside one micro-batch both classify "new" (run the batch dedup on
  *    the landed output if intra-batch dedup matters);
  *  - docs classified "new" do NOT join the corpus index mid-stream —
  *    the index refreshes on a rebuild cadence
  *    ([[Dedup.writeCorpusIndex]] over corpus ∪ landed "new" docs), the
  *    standard lambda split between a standing artifact and a live
  *    probe. Between rebuilds a re-sent new doc classifies "new" again;
  *    the landed batch_id trail makes that visible downstream.
  *  - `checkDisjoint`: the batch classifier's id-disjointness guard
  *    raises in-plan on any batch id already present in the corpus.
  *    In a STREAM that guard is a poison-batch hazard: after an index
  *    rebuild folded landed "new" docs in, an at-least-once source
  *    redelivering one of them (or a crash replaying a pre-rebuild
  *    batch post-rebuild) would fail the micro-batch, and every
  *    restart replays the same batch into the same error. Keep the
  *    default `true` only while the source's id space provably never
  *    overlaps the index (e.g. monotonic ids minted above the rebuild
  *    high-water mark); set `false` once rebuilds fold in streamed
  *    ids — a corpus-present id then classifies "exact_dup"/"near_dup"
  *    against itself, which is the correct read of a redelivery.
  * The corpus side stays exchange-free per BucketingSpec; per
  * micro-batch only the (small) batch shuffles into the bucket layout.
  */
object DedupStream {

  def startClassify(docs: DataFrame, indexName: String, outPath: String,
                    checkpoint: String = "",
                    trigger: Trigger = Trigger.ProcessingTime("5 minutes"),
                    k: Int = 8, r: Int = 2, threshold: Double = 0.8,
                    idCol: String = "doc_id", textCol: String = "text",
                    checkDisjoint: Boolean = true): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation",
        if (checkpoint.nonEmpty) checkpoint else s"${outPath}_ckpt")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the classifier walks the batch subtree several times (bands,
        // fingerprints, verify) — pin it for the duration of the batch
        batch.persist()
        try {
          Dedup.incrementalDedupIndexed(batch.sparkSession, indexName, batch,
              k, r, threshold, idCol, textCol, checkDisjoint)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(outPath)
        } finally batch.unpersist()
        ()
      }
      .start()
}
