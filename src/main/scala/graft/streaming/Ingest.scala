package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming ingest (SURVEY.md §2.9): the reference's scraper→Firebase→
  * listener chain (scraper/main.py:62-99, spark_stream.py:52-66) as one
  * Structured Streaming job — 5-minute micro-batches, day-level dedup,
  * threshold + stateful percent-change alerting, and a dual sink (landing
  * table + alert stream). The reference's save_processed_data is called
  * but never defined (spark_stream.py:46, silently swallowed at :48-49);
  * here the enriched write is real.
  *
  * Scale: dedup state is keyed (user_id, day) under a watermark so state
  * is bounded and evicted; the landing write partitions by day, giving
  * the batch layer static+dynamic partition pruning (ST2 as idempotent
  * date-partitioned layout). Deployment note (measured — SCALE.md
  * §Round-20, graft.StreamScale): at millions of state keys run the
  * RocksDB provider with
  * `spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true`
  * — the per-commit SST snapshot upload is the commit-latency wall, and
  * changelog mode measured 1.42× faster at 5M keys with the restart
  * contract unchanged.
  */
object Ingest {

  case class Event(event_id: Long, ts: Long, user_id: Long, event_type: String, value: Double)
  case class PctAlert(user_id: Long, event_id: Long, value: Double, prev_value: Double, pct: Double)

  /** Event with the derived event-time column kept alongside, so the
    * watermark attribute survives into the stateful operators. */
  case class EventT(event_id: Long, ts: Long, user_id: Long, event_type: String,
                    value: Double, event_time: java.sql.Timestamp)

  /** Attach event time + watermark ahead of the stateful operators; the
    * watermark both bounds late data and drives event-time state TTL. */
  private def watermarked(events: Dataset[Event], delay: String): Dataset[EventT] = {
    import events.sparkSession.implicits._
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_time", delay)
      .as[EventT]
  }

  /** Epoch-nano long → event-time timestamp + calendar day columns. */
  def withEventTime(events: DataFrame): DataFrame =
    events
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
      .withColumn("day", to_date(col("event_time")))

  /** ST2: at-most-one event per (user, day), late data bounded by the
    * watermark; works identically on batch frames (no-op watermark).
    *
    * Streaming uses `dropDuplicatesWithinWatermark`: plain
    * dropDuplicates never evicts state for keys that don't carry the
    * event-time column ((user_id, day) doesn't — `day` is derived
    * BEFORE the watermark), so a long-running job would hold one state
    * row per (user, day) ever seen. Within-watermark dedup expires each
    * key once the watermark passes its event time + delay — bounded
    * state, and duplicates later than the watermark were already
    * out-of-contract. */
  def dedupDaily(events: DataFrame, watermark: String = "1 day"): DataFrame = {
    val w = withEventTime(events).withWatermark("event_time", watermark)
    if (w.isStreaming) {
      // within-watermark dedup only catches duplicates whose event times
      // are <= the delay apart; a sub-day delay would silently weaken the
      // at-most-one-per-(user, day) contract the batch path guarantees
      require(atLeastOneDay(watermark),
        s"dedupDaily streaming watermark must cover a calendar day, got '$watermark'")
      w.dropDuplicatesWithinWatermark("user_id", "day")
    } else w.dropDuplicates("user_id", "day")
  }

  private def atLeastOneDay(delay: String): Boolean = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(delay))
    iv.months > 0 || iv.days >= 1 || iv.microseconds >= 86400000000L
  }

  /** The fields the [[Event]] encoding declares non-nullable — the ONE
    * definition both sides of the ingest boundary derive from, so the
    * typed path and the quarantine complement cannot drift: a row is
    * either typed or dead-lettered, never both, never neither. */
  private[streaming] val RequiredEventFields: Seq[String] =
    Seq("event_id", "ts", "user_id", "value")

  /** TRUE iff every non-nullable [[Event]] field is present. */
  private def eventContract: org.apache.spark.sql.Column =
    RequiredEventFields.map(col(_).isNotNull).reduce(_ && _)

  /** Typed ingest boundary with NULL quarantine (hostile r18): the
    * [[Event]] encoding declares non-nullable longs/double, so
    * `.as[Event]` over a frame carrying a NULL key or measure THROWS
    * mid-batch — and a streaming query then restart-loops on the same
    * poisoned batch forever. Rows missing any non-nullable field are
    * filtered here, once, at the boundary; the complement is exposed
    * as [[quarantinedEvents]] and dead-lettered by
    * [[startQuarantineSink]] (VERDICT r18 ask #4) — the engine never
    * silently drops data (the reference's ST4 lesson: its second sink
    * was a silent no-op). NULL event_type survives: String is nullable
    * and every downstream grouping handles it. */
  def typedEvents(df: DataFrame): Dataset[Event] = {
    import df.sparkSession.implicits._
    df.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .filter(eventContract)
      .as[Event]
  }

  /** The dead-letter complement of [[typedEvents]]: every row failing
    * the non-null contract, with the FULL original record preserved
    * (a quarantine that projects away columns destroys the evidence a
    * re-ingestion fix needs) plus a `reason` column naming each
    * missing field. concat_ws skips NULL branches, so reason reads
    * e.g. "null_ts,null_value" — codegen'd, no UDF. The predicate is
    * `not(eventContract)` — the EXACT complement, not a re-derived
    * list, so typed + quarantined partitions the input by
    * construction. */
  def quarantinedEvents(df: DataFrame): DataFrame =
    df.filter(!eventContract)
      .withColumn("reason", concat_ws(",",
        RequiredEventFields.map(f =>
          when(col(f).isNull, lit(s"null_$f")).otherwise(lit(null))): _*))

  /** Dead-letter sink for the quarantined complement (VERDICT r18 ask
    * #4): each micro-batch's rejects land in their own `batch_id`
    * partition of the quarantine table, with the reason column and the
    * full original record. Replay-idempotent by the same layout
    * contract as [[startIngest]]: a crash between the parquet write
    * and the checkpoint commit re-runs the SAME batch id, and dynamic
    * partition overwrite makes the replay overwrite exactly its own
    * partition — at-most-once per batch. At 100 TB the quarantine
    * stream is (by contract) a sliver of the input, so the per-batch
    * overwrite is small; the batch_id partitioning keeps reprocessing
    * ("re-ingest everything quarantined since batch N") a pruned scan. */
  def startQuarantineSink(stream: DataFrame, quarantinePath: String,
                          trigger: Trigger = Trigger.ProcessingTime("5 minutes"),
                          checkpoint: String = ""): StreamingQuery =
    quarantinedEvents(stream)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation",
        if (checkpoint.nonEmpty) checkpoint else s"${quarantinePath}_ckpt")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(quarantinePath)
        ()
      }
      .start()

  /** ST3 (threshold form): flag events whose value exceeds `threshold`. */
  def thresholdAlerts(events: DataFrame, threshold: Double = 400.0): DataFrame =
    withEventTime(events).filter(col("value") > threshold)

  /** ST3 (true reference semantics — percentage_change > 5 vs the user's
    * previous event, spark_stream.py:38-46): per-key state holds the last
    * value; arbitrary stateful processing via flatMapGroupsWithState.
    *
    * State is TTL-bounded by EVENT time: a key whose last event is
    * `idleTimeout` behind the watermark is evicted (its next event then
    * has no baseline, like a new user) — without this, months of
    * streaming accumulate one state slot per user ever seen. Event-time
    * (not processing-time) TTL is deliberate: it is replay/backfill-safe
    * (a paused job does not mass-evict live state on resume) and it
    * doesn't force the micro-batch engine into continuous empty batches
    * the way processing-time timers do. Timeouts never fire in batch
    * mode, where state is per-job anyway. */
  def statefulPctAlerts(events: Dataset[Event], pctThreshold: Double = 5.0,
                        idleTimeout: java.time.Duration = java.time.Duration.ofDays(30),
                        watermarkDelay: String = "1 hour"): Dataset[PctAlert] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    watermarked(events, watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[EventT], state: GroupState[Double]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
            var prev = if (state.exists) Some(state.get) else None
            val alerts = sorted.flatMap { e =>
              val out = prev match {
                case Some(p) if p != 0.0 =>
                  val pct = (e.value - p) / p * 100.0
                  if (pct > pctThreshold) Some(PctAlert(user, e.event_id, e.value, p, pct)) else None
                case _ => None
              }
              prev = Some(e.value)
              out
            }
            prev.foreach(state.update)
            // TTL anchored to max(watermark, this batch's max event time):
            // in the FIRST micro-batch the watermark is still 0, so a
            // watermark-only anchor resolves to ~1970 + TTL and every
            // batch-1 key times out one batch later — the documented
            // idle TTL would silently become "one batch of silence"
            if (streaming && state.exists) {
              val maxEventMs = if (sorted.nonEmpty) sorted.last.event_time.getTime else 0L
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs(), maxEventMs) + idleTimeout.toMillis)
            }
            alerts.iterator
          }
      }
  }

  /** ST3 on the Spark 4 arbitrary-state v2 API ([[statefulPctAlerts]]'s
    * modern twin): `transformWithState` with a typed [[PctAlertProcessor]]
    * — per-key `ValueState` replaces raw GroupState, and state TTL is
    * DECLARATIVE (`TTLConfig`) instead of hand-rolled timer arithmetic.
    * Requires the RocksDB state store provider.
    *
    * `ttl = Some(d)` runs in processing-time mode with per-key TTL (the
    * production form); `None` runs timeless — note that processing-time
    * mode schedules micro-batches continuously (time always advances),
    * so `processAllAvailable`-style test drivers should use `None` and
    * cover TTL via the event-time path in [[statefulPctAlerts]]. */
  def pctAlertsTws(events: Dataset[Event], pctThreshold: Double = 5.0,
                   ttl: Option[java.time.Duration] = None): Dataset[PctAlert] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.user_id)
      .transformWithState(new PctAlertProcessor(pctThreshold, ttl), timeMode, OutputMode.Append())
  }

  case class ZAnomaly(user_id: Long, event_id: Long, value: Double, z: Double)

  case class CountUpdate(user_id: Long, event_id: Long, n_total: Long)

  /** Batch→stream state handoff (the migration every production cutover
    * needs): per-user running event counts seeded from a BATCH frame of
    * historical counts, continued live by the stream — via
    * `transformWithState` with initial state
    * ([[BootstrapCountProcessor]].handleInitialState). `initial` is any
    * (user_id, n) frame — typically an aggregate over the landed
    * day-partitions the stream is taking over from. Requires the
    * RocksDB state store provider, like the other TWS ops. */
  def runningCountsTws(events: Dataset[Event],
                       initial: org.apache.spark.sql.DataFrame): Dataset[CountUpdate] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.TimeMode
    // pre-aggregate: TransformWithStateExec has NO duplicate-initial-key
    // guard — with two rows per user, handleInitialState runs per row
    // and the seed becomes shuffle-order-dependent last-wins
    val init = initial
      .select(col("user_id").cast("long").as("user_id"), col("n").cast("long").as("n"))
      .groupBy("user_id").agg(org.apache.spark.sql.functions.sum("n").as("n"))
      .as[(Long, Long)]
      .groupByKey(_._1).mapValues(_._2)
    events.groupByKey(_.user_id)
      .transformWithState(new BootstrapCountProcessor, TimeMode.None(),
        OutputMode.Append(), init)
  }

  case class InactivityAlert(user_id: Long, last_seen_ms: Long, silent_ms: Long)

  /** Timer-driven inactivity alerts (beyond-reference streaming depth):
    * a user silent for more than `gap` of EVENT time produces one alert
    * when the watermark passes their deadline — emission without input,
    * via transformWithState event-time timers ([[InactivityProcessor]]).
    * Requires the RocksDB state store provider, like the other TWS ops. */
  def inactivityAlertsTws(events: Dataset[Event],
                          gap: java.time.Duration = java.time.Duration.ofHours(6),
                          watermarkDelay: String = "1 hour"): Dataset[InactivityAlert] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    watermarked(events, watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new InactivityProcessor(gap.toMillis),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[streamingZscoreAnomalies]]'s transformWithState twin — Welford
    * moments ride in a typed product ValueState ([[ZScoreProcessor]]);
    * same TTL/TimeMode contract as [[pctAlertsTws]]. */
  def zscoreAnomaliesTws(events: Dataset[Event], threshold: Double = 3.0,
                         minN: Long = 20,
                         ttl: Option[java.time.Duration] = None): Dataset[ZAnomaly] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.user_id)
      .transformWithState(new ZScoreProcessor(threshold, minN, ttl), timeMode, OutputMode.Append())
  }

  /** Incremental streaming z-score anomalies: per-user Welford moments
    * carried in GroupState — exact running mean/σ with O(1) state per key
    * and no history recompute (the reference recomputes scipy.zscore over
    * the FULL snapshot on every request, spark_stream.py:95-156). Events
    * are scored against the state BEFORE they update it, so an outlier
    * flags itself rather than masking itself. Scores start once `minN`
    * observations exist. */
  def streamingZscoreAnomalies(events: Dataset[Event], threshold: Double = 3.0,
                               minN: Long = 20,
                               idleTimeout: java.time.Duration = java.time.Duration.ofDays(30),
                               watermarkDelay: String = "1 hour"): Dataset[ZAnomaly] = {
    import events.sparkSession.implicits._
    import graft.functions.WelfordAggregator
    import graft.functions.WelfordAggregator.Moments
    val streaming = events.isStreaming
    watermarked(events, watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[EventT], state: GroupState[Moments]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var m = if (state.exists) state.get else WelfordAggregator.zero
            val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
            val out = sorted.flatMap { e =>
              val alert =
                if (m.n >= minN && m.stddevPop > 0) {
                  val z = m.zscore(e.value)
                  if (math.abs(z) > threshold) Some(ZAnomaly(user, e.event_id, e.value, z))
                  else None
                } else None
              m = WelfordAggregator.update(m, e.value)
              alert
            }
            state.update(m)
            // same first-batch-watermark-0 anchor as statefulPctAlerts
            if (streaming) {
              val maxEventMs = if (sorted.nonEmpty) sorted.last.event_time.getTime else 0L
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs(), maxEventMs) + idleTimeout.toMillis)
            }
            out.iterator
          }
      }
  }

  case class CusumState(sUp: Double, sDn: Double)
  case class CusumAlert(event_type: String, event_id: Long, value: Double,
                        s: Double, direction: String)

  /** O(bins) state per key: reference histogram (frozen after refSize
    * values) + the current comparison block's histogram + a running
    * non-finite counter (NaN/±Inf must never masquerade as mass at an
    * edge bin — advice r13; they are counted separately and surfaced
    * on the next report). */
  case class PsiStreamState(ref: Seq[Long], refN: Long,
                            cur: Seq[Long], curN: Long,
                            nonFinite: Long = 0L)
  case class DriftReport(event_type: String, block_end_id: Long,
                         n_ref: Long, n_cur: Long, psi: Double,
                         drifted: Boolean, n_nonfinite: Long = 0L)

  /** ST extension: streaming PSI drift monitor — the in-stream twin of
    * the batch q_psi_drift: per key, the FIRST `refSize` values freeze
    * a reference histogram over `bins` equal-width bins on the fixed
    * [lo, hi) range (FINITE out-of-range values clamp to the edge bins —
    * the monitor's job is to see them pile up there; NaN/±Inf bypass
    * the histograms onto a separate n_nonfinite counter reported with
    * the next block, so bad data never reads as drift); every subsequent full
    * block of `blockSize` values emits one PSI report against the
    * reference (Laplace +1 smoothing — the identical per-bin expression
    * the batch oracle pins) and resets the block. State is O(bins) per
    * key FOREVER (two count arrays + two longs), evicted on event-time
    * idle timeout — no raw values are retained, so the monitor's memory
    * is independent of stream length; (ts, event_id) batch ordering
    * keeps replays deterministic. */
  def psiStream(events: Dataset[Event], lo: Double, hi: Double,
                bins: Int = 10, refSize: Int = 100, blockSize: Int = 50,
                threshold: Double = 0.25,
                idleTimeout: java.time.Duration = java.time.Duration.ofDays(30),
                watermarkDelay: String = "1 hour"): Dataset[DriftReport] = {
    require(bins >= 2 && hi > lo && refSize > 0 && blockSize > 0,
      s"psiStream: need bins >= 2, hi > lo, positive sizes")
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    val width = (hi - lo) / bins
    watermarked(events, watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[EventT], state: GroupState[PsiStreamState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = if (state.exists) state.get
              else PsiStreamState(Seq.fill(bins)(0L), 0L, Seq.fill(bins)(0L), 0L)
            val ref = st.ref.toArray
            val cur = st.cur.toArray
            var refN = st.refN
            var curN = st.curN
            var nonFinite = st.nonFinite
            def binOf(v: Double): Int =
              math.min(bins - 1, math.max(0, math.floor((v - lo) / width).toInt))
            val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
            val out = sorted.flatMap { e =>
              // NaN floors to bin 0 through the clamp — a NaN burst
              // must read as BAD DATA, not low-value drift (advice
              // r13): non-finite values bypass the histograms and
              // accrue on a counter reported with the next block
              if (!java.lang.Double.isFinite(e.value)) {
                nonFinite += 1L
                None
              } else if (refN < refSize) {
                ref(binOf(e.value)) += 1L; refN += 1L
                None
              } else {
                cur(binOf(e.value)) += 1L; curN += 1L
                if (curN >= blockSize) {
                  // the batch psiDrift smoothing, verbatim
                  var psi = 0.0
                  var b = 0
                  while (b < bins) {
                    val pa = (ref(b) + 1.0) / (refN + bins.toDouble)
                    val pb = (cur(b) + 1.0) / (curN + bins.toDouble)
                    psi += (pa - pb) * math.log(pa / pb)
                    b += 1
                  }
                  val report = DriftReport(key, e.event_id, refN, curN,
                    psi, psi > threshold, nonFinite)
                  java.util.Arrays.fill(cur, 0L)
                  curN = 0L
                  nonFinite = 0L
                  Some(report)
                } else None
              }
            }
            state.update(PsiStreamState(ref.toSeq, refN, cur.toSeq, curN,
              nonFinite))
            if (streaming) {
              val maxEventMs = if (sorted.nonEmpty) sorted.last.event_time.getTime else 0L
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs(), maxEventMs) + idleTimeout.toMillis)
            }
            out.iterator
          }
      }
  }

  /** Streaming CUSUM shift detector — the streaming twin of
    * q_cusum_shift's batch unrolling, as the RECURSION itself this time:
    * per event type, S⁺ ← max(0, S⁺ + (v − k)) and S⁻ ← max(0, S⁻ +
    * (k − v)) against the FIXED baseline mean `k` (a drift monitor
    * references the baseline frame, the driftMonitor rule), alerting
    * when either side crosses `h` and restarting that side (the
    * standard post-alarm reset). State is TWO doubles per key — O(1)
    * regardless of history, where the batch twin re-sorts the day grain
    * each run. Batch order is anchored like streamingZscoreAnomalies:
    * events sort by (ts, event_id) within a micro-batch, idle keys are
    * evicted by event-time timeout.
    *
    * Same blind spot as [[driftMonitor]]: silence produces no alerts —
    * pair with [[windowedCounts]] for outage detection. */
  def cusumStream(events: Dataset[Event], baselineMean: Double,
                  h: Double,
                  idleTimeout: java.time.Duration = java.time.Duration.ofDays(30),
                  watermarkDelay: String = "1 hour"): Dataset[CusumAlert] = {
    import events.sparkSession.implicits._
    val streaming = events.isStreaming
    watermarked(events, watermarkDelay)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[EventT], state: GroupState[CusumState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var st = if (state.exists) state.get else CusumState(0.0, 0.0)
            val sorted = it.toSeq.sortBy(e => (e.ts, e.event_id))
            val out = sorted.flatMap { e =>
              var up = math.max(0.0, st.sUp + (e.value - baselineMean))
              var dn = math.max(0.0, st.sDn + (baselineMean - e.value))
              val alert =
                if (up > h) {
                  val a = CusumAlert(key, e.event_id, e.value, up, "up")
                  up = 0.0
                  Some(a)
                } else if (dn > h) {
                  val a = CusumAlert(key, e.event_id, e.value, dn, "down")
                  dn = 0.0
                  Some(a)
                } else None
              st = CusumState(up, dn)
              alert
            }
            state.update(st)
            if (streaming) {
              val maxEventMs = if (sorted.nonEmpty) sorted.last.event_time.getTime else 0L
              state.setTimeoutTimestamp(
                math.max(state.getCurrentWatermarkMs(), maxEventMs) + idleTimeout.toMillis)
            }
            out.iterator
          }
      }
  }

  /** ST6 extension: watermarked tumbling-window aggregation — event count
    * and value sum per (5-minute window, event_type); late events beyond
    * the watermark are dropped, state is evicted as the watermark
    * advances (bounded state at any scale). */
  def windowedCounts(events: DataFrame,
                     windowLen: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming heavy hitters — the streaming twin of the batch
    * q_topk_partials: per watermarked tumbling window, the top-k items
    * by count via `approx_top_k_accumulate` as the ONE windowed
    * aggregate (constant-size mergeable sketch state per open window,
    * evicted by the watermark), estimates exploded on emit. Below the
    * sketch's map capacity the counts are EXACT (the no-eviction
    * theorem q_topk_partials pins); past it the ε·n overcount bound
    * applies — capacity is the accuracy dial, the plan never changes. */
  def heavyHittersStream(events: DataFrame, itemCol: String = "user_id",
                         k: Int = 5, maxItems: Int = 10000,
                         windowLen: String = "5 minutes",
                         watermark: String = "10 minutes"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen))
      .agg(expr(s"approx_top_k_accumulate(`$itemCol`, $maxItems)").as("st"))
      .select(col("window.start").as("w_start"),
        explode(expr(s"approx_top_k_estimate(st, $k)")).as("e"))
      .select(col("w_start"), col("e.item").as("item"),
        col("e.count").as("est_count"))

  /** Streaming PSI drift monitor — the streaming twin of the batch
    * psiDrift: per watermarked tumbling window, the value distribution
    * over `nBins` equal-width bins is compared against a fixed BASELINE
    * share vector (typically yesterday's batch profile), emitting one
    * (window, n, psi, drifted) row when the watermark closes the
    * window.
    *
    * The bin rollup folds into the single windowed aggregation as
    * conditional counts (one column per bin), so the whole monitor is
    * ONE stateful operator — no chained streaming aggregations, state
    * bounded at nBins longs per open window and evicted by the
    * watermark. PSI uses the same add-one smoothing as the batch twin.
    *
    * `lo`/`hi` are the FIXED bin edges (from the baseline profile, like
    * the baseline shares — a drift monitor must bin against the
    * reference frame, not the drifting window's own min/max).
    *
    * Blind spot: a window with ZERO events emits no row at all (a
    * streaming aggregation has no group to close), so a total feed
    * outage — arguably the strongest distribution shift — produces
    * silence, and a consumer watching only the `drifted` flag would
    * infer health. Pair this monitor with a heartbeat/row-count
    * monitor (e.g. [[windowedCounts]] alerting on missing windows
    * downstream), or drive n=0 windows from a clock spine where the
    * runtime provides one. */
  def driftMonitor(events: DataFrame, baseline: Seq[Double],
                   lo: Double, hi: Double,
                   windowLen: String = "5 minutes",
                   watermark: String = "10 minutes",
                   threshold: Double = 0.25): DataFrame = {
    require(baseline.nonEmpty, "driftMonitor: baseline must not be empty")
    require(math.abs(baseline.sum - 1.0) < 1e-6,
      s"driftMonitor: baseline shares must sum to 1 (got ${baseline.sum})")
    require(baseline.forall(_ > 0.0),
      "driftMonitor: every baseline share must be > 0 (smooth the " +
        "baseline the same way the windows are smoothed)")
    require(hi > lo, s"driftMonitor: hi must exceed lo ($lo, $hi)")
    val nBins = baseline.size
    // clamp BOTH ends: a value below lo would otherwise compute bin -1,
    // match no conditional count, and silently understate low-side
    // drift while still inflating n
    val bin = greatest(lit(0), least(lit(nBins - 1),
      floor((col("value") - lo) / ((hi - lo) / nBins.toDouble)).cast("int")))
    val binCounts = (0 until nBins).map(k =>
      sum(when(bin === k, 1L).otherwise(0L)).as(s"b$k"))
    val aggs = count(lit(1)).as("n") +: binCounts
    val agged = withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen))
      .agg(aggs.head, aggs.tail: _*)
    val psi = (0 until nBins).map { k =>
      val p = (col(s"b$k") + 1.0) / (col("n") + nBins.toDouble)
      val b = lit(baseline(k))
      (p - b) * log(p / b)
    }.reduce(_ + _)
    agged.select(col("window.start").as("w_start"),
      col("window.end").as("w_end"), col("n"), psi.as("psi"))
      .withColumn("drifted", col("psi") > threshold)
  }

  /** Stream-stream conversion attribution — each purchase joined to the
    * clicks by the same user in the preceding `horizon` (the reference's
    * dashboard correlates alert events against the raw feed in the
    * browser after the fact; here the correlation IS the stream). The
    * canonical stream-stream INTERVAL join: both sides carry
    * watermarks and the join predicate bounds purchase_time to
    * [click_time, click_time + horizon], so Spark derives state
    * retention for BOTH buffers — clicks are dropped once the watermark
    * passes click_time + horizon, purchases once it passes their own
    * event time. Bounded state at any stream rate; an unconstrained
    * stream-stream join would buffer both streams forever, which is why
    * Spark refuses to plan one in Append mode. `left_outer`
    * additionally emits unconverted clicks with NULL purchase columns,
    * but only once the watermark PROVES no match can still arrive —
    * the spec pins both behaviors.
    *
    * Scale shape: state is hash-partitioned by user_id on both sides
    * (the equi-part of the predicate), so the range condition evaluates
    * only within a user's bucket — no cross-partition comparison. */
  def conversionJoin(clicks: DataFrame, purchases: DataFrame,
                     delay: String = "10 minutes",
                     horizon: String = "15 minutes",
                     joinType: String = "inner"): DataFrame = {
    val c = withEventTime(clicks)
      .select(col("user_id"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", delay)
    val p = withEventTime(purchases)
      .select(col("user_id").as("p_user_id"), col("event_id").as("purchase_id"),
        col("value").as("purchase_value"), col("event_time").as("purchase_time"))
      .withWatermark("purchase_time", delay)
    c.join(p,
        col("user_id") === col("p_user_id") &&
          col("purchase_time") >= col("click_time") &&
          col("purchase_time") <= col("click_time") + expr(s"INTERVAL $horizon"),
        joinType)
      .drop("p_user_id")
  }

  /** S6/ST7 (push-broadcast sink, ref scraper/main.py:92 and 108-112):
    * per-batch push of the enriched records to live consumers. The
    * adapter runs EXECUTOR-side per partition — no driver collect; the
    * reference emits whole batches over a websocket from one process,
    * and at scale each partition pushes its own slice. Implementations
    * must be serializable. [[LiveDirPush]] is the bundled emitter; a
    * websocket/message-bus bridge drops in behind the same two-method
    * surface without touching the ingest query. */
  trait PushAdapter extends Serializable {
    /** Called once per (batch, partition) with the records as JSON lines. */
    def push(batchId: Long, partitionId: Int, records: Iterator[String]): Unit

    /** Driver-side hook before a batch's partition pushes: replay
      * cleanup. A replayed batch may plan FEWER partitions than the
      * failed attempt (AQE, changed parallelism), so name-overwrite
      * alone can leave the dead attempt's higher part ids behind;
      * clearing the batch's previous emission here restores the
      * at-most-once contract. */
    def beginBatch(batchId: Long): Unit = ()
  }

  /** Newline-JSON live feed in `dir`: batch b / partition p lands at
    * `batch_<b>_part_<p>.jsonl` via temp-file write + atomic move, so a
    * tailing consumer (websocket bridge, inotify watcher) never reads a
    * partial file. Deterministic names make a batch replay overwrite its
    * own files — at-most-once per batch, by layout, exactly like the
    * landing sink. Empty partitions emit nothing.
    *
    * CONTRACT: `dir` must be a filesystem shared by the driver and every
    * executor (local mode, NFS, a fuse-mounted bucket) — `beginBatch`'s
    * stale-file sweep runs DRIVER-side while `push` writes
    * executor-side; on node-local disks the sweep would miss executor
    * files and a shrunken replay could leave dead higher-part files
    * behind. A multi-node deployment on node-local storage needs a
    * different adapter (push to a bus, not a directory). */
  final class LiveDirPush(dir: String) extends PushAdapter {
    override def beginBatch(batchId: Long): Unit = {
      val d = new java.io.File(dir)
      if (d.isDirectory) {
        val stale = d.listFiles((_, n) =>
          n.startsWith(s"batch_${batchId}_part_") || n.startsWith(s".batch_${batchId}_part_"))
        stale.foreach(_.delete())
      }
    }

    override def push(batchId: Long, partitionId: Int, records: Iterator[String]): Unit =
      if (records.hasNext) {
        val d = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(d)
        // tmp name is per-ATTEMPT: under speculative execution or a retry
        // racing a zombie first attempt, a shared tmp name would let two
        // writers interleave into one file and publish corrupt JSON; each
        // attempt writes privately, the atomic move stays last-wins
        val attempt = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        val tmp = d.resolve(s".batch_${batchId}_part_${partitionId}_a$attempt.tmp")
        val out = d.resolve(s"batch_${batchId}_part_$partitionId.jsonl")
        val w = java.nio.file.Files.newBufferedWriter(tmp)
        try records.foreach { r => w.write(r); w.write('\n') } finally w.close()
        java.nio.file.Files.move(tmp, out,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
  }

  /** ST6 extension: per-user SESSION windows (streaming counterpart of
    * the batch Sessionize operator): a session closes when a user is
    * silent for `gap`; the watermark both bounds state and finalizes
    * sessions. Built-in `session_window` — state merging, late-row
    * handling and append-mode finalization come from the engine, not
    * hand-rolled state.
    *
    * Boundary semantics MATCH operators/Sessionize.scala (measured,
    * pinned in StreamingSpec): an event arriving exactly `gap` after
    * the previous one merges into the same session, like the batch
    * operator's strict `diff > gap` split. */
  def sessionCounts(events: DataFrame,
                    gap: String = "30 minutes",
                    watermark: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n"), col("sum_value"))

  /** ST1+ST4+ST7: micro-batch ingest with a dual sink — the deduped
    * batch lands in the (day, batch_id)-partitioned landing table and
    * the alert subset in the alert table — via foreachBatch; an optional
    * [[PushAdapter]] additionally broadcasts each batch to live
    * consumers (S6).
    *
    * Quarantine split is UPSTREAM of the dedup (advice r19): the old
    * post-dedup split lost NULL-keyed poison before the dead-letter
    * predicate ever saw it — dropDuplicatesWithinWatermark collapses
    * NULL (user_id, day) keys into one surviving row and the watermark
    * path drops NULL event_time rows outright. Here the RAW stream is
    * split in the streaming plan: the contract-clean side keeps the
    * cross-batch streaming dedup (a per-batch dedup inside foreachBatch
    * would re-admit duplicates spanning micro-batches), the poison side
    * bypasses dedup entirely, and the two branches are self-unioned so
    * ONE query and ONE checkpoint carry both — `reason IS NULL` marks
    * the clean side, which is unambiguous because [[quarantinedEvents]]
    * produces only non-null reasons by construction.
    *
    * Replay-idempotent: a crash between the parquet write and the
    * checkpoint commit makes Spark re-run the SAME batch id, and a
    * plain append would duplicate it. Writing each batch into its own
    * batch_id partition with dynamic partition overwrite means a replay
    * overwrites exactly its own partition — at-most-once per batch, by
    * layout. The checkpoint defaults to a sibling of the landing path
    * (a fixed shared default would let two jobs corrupt each other's
    * offsets). */
  def startIngest(stream: DataFrame, landingPath: String, alertPath: String,
                  trigger: Trigger = Trigger.ProcessingTime("5 minutes"),
                  checkpoint: String = "",
                  alertThreshold: Double = 400.0,
                  push: Option[PushAdapter] = None,
                  quarantinePath: String = ""): StreamingQuery = {
    // When no quarantinePath is configured the split is skipped and the
    // batch lands whole (backward-compatible single-table mode).
    val planned =
      if (quarantinePath.isEmpty) dedupDaily(stream)
      else dedupDaily(stream.filter(eventContract))
        .withColumn("reason", lit(null).cast("string"))
        .unionByName(quarantinedEvents(stream), allowMissingColumns = true)
    planned
      .writeStream
      .outputMode("append")
      .option("checkpointLocation",
        if (checkpoint.nonEmpty) checkpoint else s"${landingPath}_ckpt")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        // finally: a failed sink write must not leak the persisted
        // batch — each replay would otherwise pin a fresh copy until
        // executors spill
        try {
          // dead-letter FIRST (r19): rows failing the Event contract go
          // to the quarantine table with reasons + batch id, and the
          // landing write below then carries only contract-clean rows —
          // the landing table's consumers (every batch query) get the
          // typed invariant by layout, and nothing is silently dropped
          // (the reference's ST4 lesson). Same replay-idempotent
          // batch_id-overwrite contract as the other two sinks.
          val landed =
            if (quarantinePath.isEmpty) batch
            else {
              batch.filter(col("reason").isNotNull)
                .drop("event_time", "day")
                .withColumn("batch_id", lit(batchId))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(quarantinePath)
              batch.filter(col("reason").isNull).drop("reason")
            }
          landed.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day", "batch_id")
            .parquet(landingPath)
          // the alert sink is the documented ST3 threshold operator — one
          // definition, no drift between the stream and batch paths
          // alert + live-push sinks mirror the LANDED (contract-clean)
          // side — a quarantined row must not alert or broadcast while
          // absent from the landing table the alert would point back to
          thresholdAlerts(landed, alertThreshold)
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(alertPath)
          // S6 live push: executor-side, per partition, over the
          // landed (contract-clean) side of the persisted batch — the
          // driver never materializes row data
          push.foreach { p =>
            p.beginBatch(batchId)
            landed.toJSON.foreachPartition { (it: Iterator[String]) =>
              p.push(batchId, org.apache.spark.TaskContext.getPartitionId(), it)
            }
          }
        } finally batch.unpersist()
        ()
      }
      .start()
  }
}
