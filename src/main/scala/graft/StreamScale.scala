package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Ingest

/** Streaming state at production cardinality (VERDICT r19 ask #1): every
  * stateful cert runs at 1.5k-40k state keys, so the engine's
  * "watermark-bounded state" claim had no measured leg. This study
  * drives MILLIONS of distinct keys through the three production
  * stateful shapes — Welford z-score (flatMapGroupsWithState),
  * percent-change alerts (the reference's spark_stream.py:38-46
  * semantics), and within-watermark daily dedup — as real file-source
  * Structured Streaming queries, and records per-micro-batch
  * state_rows / state_bytes / throughput, an EVICTION proof (state
  * must shrink as the watermark passes idle keys' TTL), and a
  * kill-and-resume at full state (restart from checkpoint with
  * millions of state rows, output equivalence vs an uninterrupted
  * run).
  *
  * Input derivation: the SF events table amplified by key-splitting —
  * each original user's first `evPerKey` events are replicated across
  * `ampl` disjoint key ranges (user_id*ampl+r), preserving the real
  * table's event-time distribution (which drives the watermark and
  * therefore eviction) while scaling DISTINCT KEYS, the dimension
  * state size actually depends on. Files are range-partitioned by ts
  * so maxFilesPerTrigger=1 yields time-ordered micro-batches and the
  * watermark advances monotonically through the month, exactly like a
  * live feed.
  *
  * Run: tools/graft-java.sh graft.StreamScale [sfDir] [outJson]
  * Env: STREAMSCALE_KEYS (default 5000000), STREAMSCALE_EV_PER_KEY (4),
  *      STREAMSCALE_FILES (6), SPARK_GRAFT_CPUS (32).
  */
object StreamScale {

  private val HdfsProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def r3(v: Double): String =
    java.lang.String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Stage the amplified event files; returns (nKeys, nRows, srcDir). */
  private def stage(spark: SparkSession, sfDir: String, targetKeys: Long,
                    evPerKey: Int, nFiles: Int,
                    tmp: java.nio.file.Path): (Long, Long, String) = {
    val ev = Tables.normalizeTs(Tables.events(spark, sfDir))
      .select("event_id", "ts", "user_id", "event_type", "value")
    val users = ev.select("user_id").distinct().count()
    val ampl = math.max(1L, (targetKeys + users - 1) / users)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val base = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= evPerKey).drop("rn")
    // key-splitting join: the range side is tiny (ampl rows) and MUST
    // broadcast — a shuffled cross join here would dominate the study
    // with staging cost that a real feed never pays
    val amp = base.crossJoin(broadcast(spark.range(ampl).toDF("r")))
      .select(
        (col("event_id") * ampl + col("r")).as("event_id"),
        // nanosecond jitter keeps (ts, event_id) ordering unique per
        // key without moving any event across a watermark boundary
        (col("ts") + pmod(col("r"), lit(997L))).as("ts"),
        (col("user_id") * ampl + col("r")).as("user_id"),
        col("event_type"), col("value"))
    val srcDir = tmp.resolve("events_amp").toString
    amp.repartitionByRange(nFiles, col("ts"))
      .write.mode("overwrite").parquet(srcDir)
    // FileStreamSource orders by MODIFICATION TIME, and a parquet job's
    // part files get mtimes in task-completion order — arbitrary. The
    // first smoke run processed a late-range file first, so the
    // watermark jumped a fortnight ahead and silently late-dropped
    // whole earlier files (state stuck at 86% of keys, eviction flat).
    // Stamp strictly increasing mtimes in part-name order (the
    // repartitionByRange output order == time order) so micro-batches
    // replay the month chronologically, like a live feed.
    val parts = new java.io.File(srcDir).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    val mt0 = parts.map(_.lastModified()).max
    parts.zipWithIndex.foreach { case (f, i) =>
      require(f.setLastModified(mt0 + (i + 1) * 2000L),
        s"stage: could not stamp mtime on ${f.getName}")
    }
    val staged = spark.read.parquet(srcDir)
    (users * ampl, staged.count(), srcDir)
  }

  /** One streaming leg over the staged files: AvailableNow +
    * maxFilesPerTrigger=1 (time-ordered micro-batches), noop sink
    * (the resume leg uses the file sink separately — the memory sink
    * cannot recover from a checkpoint), per-batch state telemetry
    * from StreamingQueryProgress. */
  private def runLeg(spark: SparkSession, name: String, srcDir: String,
                     ckpt: String, provider: String)
                    (mk: Dataset[Ingest.Event] => Dataset[_]): String = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
    val schema = spark.read.parquet(srcDir).schema
    val src = Ingest.typedEvents(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir))
    val t0 = System.nanoTime()
    val q = mk(src).writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("noop").start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val prog = q.recentProgress.toSeq
    val perBatch = prog.map { p =>
      val sr = p.stateOperators.map(_.numRowsTotal).sum
      val sb = p.stateOperators.map(_.memoryUsedBytes).sum
      s"""{"batch":${p.batchId},"rows":${p.numInputRows},""" +
        s""""state_rows":$sr,"state_bytes":$sb,""" +
        s""""batch_ms":${p.batchDuration}}"""
    }
    val inRows = prog.map(_.numInputRows).sum
    val peakRows = prog.map(_.stateOperators.map(_.numRowsTotal).sum)
      .maxOption.getOrElse(0L)
    val finalRows = prog.lastOption
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
    val peakBytes = prog.map(_.stateOperators.map(_.memoryUsedBytes).sum)
      .maxOption.getOrElse(0L)
    System.err.println(f"[streamscale] $name%-22s ${wall}%.1f s, " +
      f"$inRows rows, peak state $peakRows rows / ${peakBytes / 1e6}%.0f MB")
    s""""$name":{"wall_sec":${r3(wall)},"rows":$inRows,""" +
      s""""rows_per_sec":${(inRows / wall).round},""" +
      s""""state_rows_peak":$peakRows,"state_rows_final":$finalRows,""" +
      s""""state_bytes_peak":$peakBytes,"provider":"${provider.split('.').last}",""" +
      s""""batches":[${perBatch.mkString(",")}]}"""
  }

  /** The full study. `compact` (Bench mode) runs the three core legs
    * once under RocksDB; the standalone main adds the HDFS/RocksDB A/B
    * and a warm replay. Returns one JSON object. */
  def study(spark: SparkSession, sfDir: String, targetKeys: Long,
            evPerKey: Int, nFiles: Int, compact: Boolean): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-streamscale")
    try {
      val t0 = System.nanoTime()
      val (nKeys, nRows, srcDir) = stage(spark, sfDir, targetKeys, evPerKey, nFiles, tmp)
      val stageSec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[streamscale] staged $nRows rows / $nKeys keys " +
        f"in ${stageSec}%.1f s ($nFiles files)")
      def ck(n: String) = s"$tmp/ckpt/$n"
      val legs = scala.collection.mutable.ArrayBuffer[String]()

      // 1. Welford z-score — the O(1)-per-key running-moments shape.
      // Cold under RocksDB; the standalone study adds a warm replay
      // (fresh checkpoint, warmed JVM) and the HDFS-provider A/B.
      legs += runLeg(spark, "welford_rocks_cold", srcDir, ck("wr1"), RocksProvider)(
        ev => Ingest.streamingZscoreAnomalies(ev))
      if (!compact) {
        legs += runLeg(spark, "welford_rocks_warm", srcDir, ck("wr2"), RocksProvider)(
          ev => Ingest.streamingZscoreAnomalies(ev))
        legs += runLeg(spark, "welford_hdfs", srcDir, ck("wh"), HdfsProvider)(
          ev => Ingest.streamingZscoreAnomalies(ev))
        // pct alerts at the production 30-day TTL (no eviction inside
        // the one-month window — the steady-state price of the shape)
        legs += runLeg(spark, "pct_alerts_rocks", srcDir, ck("pa"), RocksProvider)(
          ev => Ingest.statefulPctAlerts(ev))
      }

      // 1b. Changelog-checkpointing A/B (STREAMSCALE_CHANGELOG=1, full
      // mode): by default RocksDB uploads SST snapshots per commit —
      // at production state sizes the upload IS the commit latency.
      // Changelog mode (public conf, Spark 3.4+) writes per-batch
      // deltas instead and snapshots in the background maintenance
      // thread, trading restart replay for commit latency — the
      // 100 TB-relevant knob. Measured here as a same-era pair: the
      // welford leg under each mode (per-batch batch_ms carries the
      // commit cost) — the resume story for changelog mode is the
      // SAME file-sink restart path, replaying the delta log.
      val ChangelogConf =
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
      if (!compact && sys.env.get("STREAMSCALE_CHANGELOG").contains("1")) {
        spark.conf.set(ChangelogConf, "true")
        try legs += runLeg(spark, "welford_rocks_changelog", srcDir,
          ck("wrchg"), RocksProvider)(ev => Ingest.streamingZscoreAnomalies(ev))
        finally spark.conf.set(ChangelogConf, "false")
      }

      // 2. Daily dedup — state keyed (user, day) WITHIN the watermark:
      // the leg proves the within-watermark variant evicts closed days
      // as the watermark advances (peak state ≪ total distinct pairs).
      legs += runLeg(spark, "dedup_daily_rocks", srcDir, ck("dd"), RocksProvider)(
        ev => Ingest.dedupDaily(ev.toDF()))

      // 3. Eviction proof — pct alerts with a 2-DAY idle TTL over a
      // month of event time: keys idle ≥2 days behind the watermark
      // MUST be evicted, so final state ≪ peak state. A flat curve
      // here would falsify the bounded-state claim.
      val evictJson = runLeg(spark, "pct_ttl2d_evict", srcDir, ck("ev"), RocksProvider)(
        ev => Ingest.statefulPctAlerts(ev,
          idleTimeout = java.time.Duration.ofDays(2)))
      legs += evictJson
      val evPeak = """"state_rows_peak":(\d+)""".r.findFirstMatchIn(evictJson).get.group(1).toLong
      val evFinal = """"state_rows_final":(\d+)""".r.findFirstMatchIn(evictJson).get.group(1).toLong

      // 4. Kill-and-resume at FULL state: phase 1 streams the first
      // half of the files into pct-alert state, the query stops, a new
      // query on the SAME checkpoint restores millions of state rows
      // (RocksDB reload priced in phase-2 wall) and finishes the feed.
      // pct alerts, not welford, because the alert stream is DENSE
      // (every >5% move emits) — a near-empty output would make the
      // conservation check vacuous, as welford's minN=20 does at 4
      // events/key. Output conservation: phase1+phase2 rows/hash ==
      // an uninterrupted run over the same files.
      def resumeLeg(label: String, changelog: Boolean): String = {
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksProvider)
        spark.conf.set(ChangelogConf, changelog.toString)
        try {
          val files = new java.io.File(srcDir).listFiles()
            .filter(f => f.getName.startsWith("part-")).sortBy(_.getName)
          val half = math.max(1, files.length / 2)
          val linkDir = tmp.resolve(s"${label}_src")
          java.nio.file.Files.createDirectory(linkDir)
          def link(fs: Seq[java.io.File]): Unit = fs.foreach { f =>
            java.nio.file.Files.createSymbolicLink(
              linkDir.resolve(f.getName), f.toPath)
          }
          val schema = spark.read.parquet(srcDir).schema
          // the memory sink cannot recover from a checkpoint; the FILE
          // sink is the production restart path anyway — its
          // _spark_metadata commit log makes the restarted query resume
          // exactly-once into the same output directory
          val splitOut = s"$tmp/${label}_out_split"
          def phase(out: String, ckName: String): (Double, Long, Long) = {
            val src = Ingest.typedEvents(
              spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1").parquet(linkDir.toString))
            val t = System.nanoTime()
            val q = Ingest.statefulPctAlerts(src).writeStream
              .format("parquet").option("path", out)
              .option("checkpointLocation", ck(ckName))
              .trigger(Trigger.AvailableNow()).start()
            q.awaitTermination()
            val wall = (System.nanoTime() - t) / 1e9
            val prog = q.recentProgress.toSeq
            val peak = prog.map(_.stateOperators.map(_.numRowsTotal).sum)
              .maxOption.getOrElse(0L)
            (wall, peak, prog.map(_.numInputRows).sum)
          }
          def dirHash(out: String): (Long, Long) = {
            val df = spark.read.parquet(out)
            val h = df.select(pmod(xxhash64(
                df.columns.map(c => col(c).cast("string")): _*),
                lit(1000000007L)).as("h"))
              .agg(sum(col("h"))).head()
            (df.count(), if (h.isNullAt(0)) 0L else h.getLong(0))
          }
          link(files.take(half).toSeq)
          val (w1, state1, rows1) = phase(splitOut, label)
          link(files.drop(half).toSeq)
          val (w2, state2, rows2) = phase(splitOut, label)
          val (nSplit, hSplit) = dirHash(splitOut)
          // uninterrupted control over the same via-symlink source dir
          val ctlOut = s"$tmp/${label}_out_ctl"
          val (_, _, _) = phase(ctlOut, s"${label}_ctl")
          val (nc, hc) = dirHash(ctlOut)
          s""""$label":{"phase1_sec":${r3(w1)},"phase1_rows":$rows1,""" +
            s""""state_at_kill":$state1,"phase2_sec":${r3(w2)},""" +
            s""""phase2_rows":$rows2,"state_after_resume":$state2,""" +
            s""""out_rows_split":$nSplit,"out_rows_uninterrupted":$nc,""" +
            s""""output_match":${nSplit == nc && hSplit == hc}}"""
        } finally spark.conf.set(ChangelogConf, "false")
      }
      legs += resumeLeg("resume", changelog = false)
      // changelog-mode restart: the A/B's commit-latency win is only
      // deployable if a kill at full state resumes THROUGH a delta-log
      // checkpoint with the same output conservation — measured, not
      // argued (same env gate as the throughput A/B)
      if (!compact && sys.env.get("STREAMSCALE_CHANGELOG").contains("1"))
        legs += resumeLeg("resume_changelog", changelog = true)

      s"""{"keys":$nKeys,"rows":$nRows,"files":$nFiles,""" +
        s""""ev_per_key":$evPerKey,"stage_sec":${r3(stageSec)},""" +
        s""""eviction_proof":${evFinal < evPeak / 2},""" +
        s""""eviction_peak":$evPeak,"eviction_final":$evFinal,""" +
        s""""legs":{${legs.mkString(",")}}}"""
    } finally {
      try IoUtil.deleteRecursively(tmp) catch { case _: Throwable => () }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outJson = if (args.length > 1) args(1) else "streaming_scale.json"
    val targetKeys = sys.env.getOrElse("STREAMSCALE_KEYS", "5000000").toLong
    val evPerKey = sys.env.getOrElse("STREAMSCALE_EV_PER_KEY", "4").toInt
    val nFiles = sys.env.getOrElse("STREAMSCALE_FILES", "6").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val json = study(spark, sfDir, targetKeys, evPerKey, nFiles, compact = false)
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(outJson),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
