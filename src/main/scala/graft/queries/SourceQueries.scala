package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.Sources

/** Sink-layer queries: the compaction sink on the same oracle gate as
  * every operator (VERDICT r5 item 5 — `Sources.writeCompacted` was
  * spec-only; a sink whose output nobody re-reads is untested at the
  * contract level).
  *
  * q_compaction_roundtrip writes the events table through the
  * range-partitioned sorted-within-file compaction sink, reads the
  * files back, and returns the full content — the oracle is identity
  * over the source table, so the gate proves the sink loses, duplicates
  * and corrupts nothing (doubles/longs roundtrip parquet bit-exact).
  * The physical-layout properties (per-file sortedness, disjoint
  * ranges, maxRecordsPerFile rolling) stay asserted in SourcesSpec;
  * the file-count cap is additionally enforced here at construction.
  */
object SourceQueries {

  /** Compacted copy written once per (session, dir) — reps in the bench
    * then measure the read-back plan, not a repeated write; the write
    * cost itself is visible in the bench's cold/warmup accounting. */
  private val compactedMemo = new SessionMemo[String, String]

  // same sweep discipline as MultimodalQueries' fixture dirs: ONE static
  // shutdown hook draining a shared queue (not one hook per write)
  private val compactedDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var tmp = compactedDirs.poll()
      while (tmp != null) {
        try graft.IoUtil.deleteRecursively(tmp)
        catch { case scala.util.control.NonFatal(_) => () }
        tmp = compactedDirs.poll()
      }
    }))
  }

  private val NFiles = 8

  /** Sink → source roundtrip over the compaction layout: write UP TO
    * [[NFiles]] range-partitioned files sorted by (ts, event_id) —
    * event_id is the high-cardinality tiebreak the writeCompacted
    * contract prescribes for exact file counts — read them back, emit
    * everything. Oracle = the source table verbatim. */
  def qCompactionRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = compactedMemo.getOrElseUpdate(spark, dir) {
      val tmp = java.nio.file.Files.createTempDirectory("graft-compaction")
      compactedDirs.add(tmp)
      val path = tmp.toString + "/events"
      Sources.writeCompacted(
        Tables.events(spark, dir).select("event_id", "ts", "user_id", "event_type", "value"),
        path, Seq("ts", "event_id"), nFiles = NFiles)
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      require(files.length >= 1 && files.length <= NFiles,
        s"compaction wrote ${files.length} files, contract is 1..$NFiles")
      path
    }
    // ts compared at MICROsecond grain: DuckDB reads parquet
    // TIMESTAMP(NANOS) at its native micro precision, so raw nanos can
    // never hash-match — the roundtrip itself still moves full nanos
    // (the written/reread column is the untouched epoch-nano long)
    spark.read.parquet(out)
      .select(col("event_id"), expr("ts DIV 1000").as("ts_us"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy("event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_compaction_roundtrip" -> qCompactionRoundtrip _)

  val oracles: Map[String, String] = Map(
    "q_compaction_roundtrip" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |FROM events ORDER BY event_id""".stripMargin)
}
