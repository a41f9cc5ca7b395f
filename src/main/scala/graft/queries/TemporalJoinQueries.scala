package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{AsOfJoin, BandJoin, Sessionize}

/** Temporal-alignment operators: backward as-of join and gap
  * sessionization over `events`. The DuckDB oracles use the native ASOF
  * JOIN / window formulations on epoch_ns(ts) (bit-identical to the
  * engine's epoch-nano longs). */
object TemporalJoinQueries {

  /** As-of join: each purchase gets the user's most recent signup value
    * at-or-before its timestamp — via the NATIVE physical operator
    * (graft.plans.AsOfJoinExec, two-pointer merge over co-partitioned
    * sorted children); PlanSpec asserts the custom node, TemporalOpsSpec
    * cross-checks it against the composed union+window form. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val signups = e.filter(col("event_type") === "signup")
      .select("user_id", "ts", "value")
    AsOfJoin.asofBackwardNative(purchases, signups, "user_id", "ts", "value")
      .select("event_id", "user_id", "value", "asof_value")
      .orderBy("event_id")
  }

  /** The same as-of join through the COMPOSED union+window form
    * (operators.AsOfJoin.asofBackward, SURVEY §7.3 path (a)) — declared
    * so both implementations sit on the DuckDB oracle and the bench can
    * A/B medians + shuffle bytes between them (VERDICT r3 item 3). */
  def qAsofJoinComposed(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "value")
    val signups = e.filter(col("event_type") === "signup")
      .select("user_id", "ts", "value")
    AsOfJoin.asofBackward(purchases, signups, "user_id", "ts", "value")
      .select("event_id", "user_id", "value", "asof_value")
      .orderBy("event_id")
  }

  /** Sessionization with a 6-hour gap; per-session summaries. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame =
    Sessionize.sessionSummary(
      Tables.events(spark, dir), "user_id", "ts",
      gapNanos = 6L * 3600L * 1000000000L, idCol = "event_id")
      .select("user_id", "session_idx", "n_events", "duration_s", "first_event")
      .orderBy("user_id", "session_idx")

  /** Session-size distribution — the engagement histogram over
    * [[graft.operators.Sessionize.sessionSummary]]'s output: how many
    * sessions have k events, with exact mean/max duration per size
    * class (duration is an integer-second quotient, so the mean is an
    * exact rational — no float accumulation).
    *
    * Scale shape: the session rollup is the q_sessionize plan (one
    * user-partitioned window + one (user, session) aggregate); the
    * histogram adds a bounded size-class rollup on top. */
  def qSessionStats(spark: SparkSession, dir: String): DataFrame =
    Sessionize.sessionSummary(
        Tables.events(spark, dir), "user_id", "ts",
        gapNanos = 6L * 3600L * 1000000000L, idCol = "event_id")
      .groupBy(col("n_events"))
      .agg(count(lit(1)).as("n_sessions"),
        rnd(sum(col("duration_s")).cast("double") /
          count(lit(1)).cast("double"), 2).as("avg_duration_s"),
        max(col("duration_s")).as("max_duration_s"))
      .orderBy("n_events")

  /** Band join: purchases within ±1 hour of an error by the same user —
    * bucketed equi-join (operators.BandJoin), never a key-only join with
    * a post-filter band. */
  def qBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("user_id") < 30)
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts").as("error_ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    BandJoin.bandJoin(errors, purchases, "user_id", "error_ts", "purchase_ts",
      tol = 3600L * 1000000000L)
      .select(col("user_id"), col("error_id"), col("purchase_id"))
      .orderBy("user_id", "error_id", "purchase_id")
  }

  /** Last-touch attribution — each purchase credits the user's most
    * recent PRIOR non-purchase event (the channel), revenue rolled up
    * per channel: the ffill idiom (last_value ignoring NULLs over the
    * (ts, id)-ordered per-user window) applied to the touch column, so
    * attribution is one window + one bounded rollup — no as-of join
    * materialization, no fact×fact. A purchase with no prior touch
    * lands in 'none' (kept, so revenue always reconciles to the
    * purchase total).
    *
    * Scale: the window partitions per user (the sessionize partition
    * argument); revenue is an exact integer-cent sum divided once. */
  def attribution(df: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, idCol: String, valCol: String,
                  purchaseType: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("u").orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(userCol).as("u"), col(tsCol), col(idCol),
        col(typeCol).as("et"), centsOf(valCol).as("cents"),
        when(col(typeCol) =!= purchaseType, col(typeCol)).as("touch"))
      .withColumn("att", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("et") === purchaseType)
      .groupBy(coalesce(col("att"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        rnd(sum(col("cents")).cast("double") / 100.0, 2).as("revenue"))
  }

  def qAttribution(spark: SparkSession, dir: String): DataFrame =
    attribution(Tables.events(spark, dir), "user_id", "event_type",
      "ts", "event_id", "value", "purchase")
      .orderBy("channel")

  /** Path depth / top-k for [[qSessionPaths]] — interpolated into BOTH
    * engines. */
  val PathDepth = 3
  val PathK = 10

  /** Top session paths — the first [[PathDepth]] event types of each
    * gap session joined as `a>b>c`, counted across sessions: the
    * sequence-mining read over the Sessionize operator ("what do users
    * DO in a session"). Path assembly is order-deterministic on both
    * engines: Spark sorts the collected (rn, type) structs, DuckDB
    * string_aggs ORDER BY rn — strings only, no float order hazard.
    *
    * Scale: sessionize's per-user window, a per-(user, session) rank
    * window (same partition grain), one path rollup, deterministic
    * (count desc, path) top-k. */
  def sessionPaths(df: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, idCol: String, gapNanos: Long,
                   depth: Int = PathDepth, k: Int = PathK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sess = Sessionize.withSessionIdx(
      df.select(col(userCol).as("user"), col(typeCol).as("et"),
        col(tsCol), col(idCol)),
      "user", tsCol, gapNanos, Seq(col(tsCol), col(idCol)))
    val wS = Window.partitionBy("user", "session_idx")
      .orderBy(col(tsCol), col(idCol))
    sess
      .withColumn("rn", row_number().over(wS))
      .filter(col("rn") <= depth)
      .groupBy("user", "session_idx")
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("rn"), col("et")))),
          x => x.getField("et")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), col("path"))
      .limit(k)
  }

  def qSessionPaths(spark: SparkSession, dir: String): DataFrame =
    // Examined and deliberately left on the AQE layout (r21, measured
    // and REVERTED): the sessionize→rank→path chain rides ONE
    // user-keyed exchange that AQE coalesces to 2 tasks at fixture
    // bytes (~460 ms of window CPU on two cores). Pinning it wider via
    // Tables.distributed read WORSE in interleaved A/B at both 32 and
    // 8 blocks (+0.24/+0.01/+0.26 and +0.26/-0.03/+0.17 s): the
    // four-operator window chain pays per-task overhead on every stage,
    // and 3-12k-row tasks don't amortize it — the wave-3 data-grain
    // lesson. At production shuffle bytes AQE stops coalescing and the
    // chain parallelizes by itself; the plan shape (one exchange) is
    // already the floor.
    sessionPaths(Tables.events(spark, dir), "user_id", "event_type",
      "ts", "event_id", gapNanos = 6L * 3600L * 1000000000L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_attribution" -> qAttribution _,
    "q_session_paths" -> qSessionPaths _,
    "q_asof_join" -> qAsofJoin _,
    "q_asof_join_composed" -> qAsofJoinComposed _,
    "q_sessionize" -> qSessionize _,
    "q_session_stats" -> qSessionStats _,
    "q_band_join" -> qBandJoin _,
  )

  val oracles: Map[String, String] = Map(
    // the ffill idiom on the touch column (IGNORE NULLS last_value),
    // exact integer-cent revenue
    "q_attribution" ->
      """WITH ev AS (
        |  SELECT user_id AS u, event_id, epoch_ns(ts) AS tsn,
        |    event_type AS et,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
        |    CASE WHEN event_type <> 'purchase' THEN event_type END AS touch
        |  FROM events),
        |a AS (
        |  SELECT *, last_value(touch IGNORE NULLS) OVER (
        |    PARTITION BY u ORDER BY tsn, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS att
        |  FROM ev)
        |SELECT coalesce(att, 'none') AS channel,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  floor((CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0)
        |    * 1e2 + 0.5) / 1e2 AS revenue
        |FROM a WHERE et = 'purchase'
        |GROUP BY coalesce(att, 'none') ORDER BY channel""".stripMargin,
    // same session flag/rank chain as q_sessionize; string_agg ORDER BY
    // rn is the DuckDB twin of Spark's sorted-struct path assembly
    "q_session_paths" ->
      s"""WITH o AS (
         |  SELECT user_id, event_id, event_type, epoch_ns(ts) AS tsn
         |  FROM events),
         |f AS (
         |  SELECT *, CASE WHEN tsn - lag(tsn)
         |      OVER (PARTITION BY user_id ORDER BY tsn, event_id) > 21600000000000
         |    THEN 1 ELSE 0 END AS flag
         |  FROM o),
         |s AS (
         |  SELECT *, sum(flag) OVER (PARTITION BY user_id
         |    ORDER BY tsn, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
         |  FROM f),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id, session_idx
         |    ORDER BY tsn, event_id) AS rn
         |  FROM s),
         |p AS (
         |  SELECT user_id, session_idx,
         |    string_agg(event_type, '>' ORDER BY rn) AS path
         |  FROM r WHERE rn <= $PathDepth GROUP BY user_id, session_idx)
         |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         |FROM p GROUP BY path
         |ORDER BY n_sessions DESC, path LIMIT $PathK""".stripMargin,
    "q_band_join" ->
      """SELECT e.user_id, e.event_id AS error_id, p.event_id AS purchase_id
        |FROM events e JOIN events p ON e.user_id = p.user_id
        |  AND e.event_type = 'error' AND p.event_type = 'purchase'
        |  AND abs(epoch_ns(e.ts) - epoch_ns(p.ts)) <= 3600000000000
        |WHERE e.user_id < 30
        |ORDER BY e.user_id, error_id, purchase_id""".stripMargin,
    // both implementations against the SAME native DuckDB ASOF oracle
    "q_asof_join_composed" ->
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_ns(ts) AS tsn, value
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, epoch_ns(ts) AS tsn, max(value) AS rv
        |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.value, r.rv AS asof_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tsn >= r.tsn
        |ORDER BY l.event_id""".stripMargin,
    "q_asof_join" ->
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_ns(ts) AS tsn, value
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, epoch_ns(ts) AS tsn, max(value) AS rv
        |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.value, r.rv AS asof_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tsn >= r.tsn
        |ORDER BY l.event_id""".stripMargin,
    // the q_sessionize CTE chain with a bounded size-class rollup;
    // mean duration is an exact rational over the integer-second
    // quotients
    "q_session_stats" ->
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tsn FROM events),
        |f AS (
        |  SELECT *, CASE WHEN tsn - lag(tsn)
        |      OVER (PARTITION BY user_id ORDER BY tsn, event_id) > 21600000000000
        |    THEN 1 ELSE 0 END AS flag
        |  FROM o),
        |s AS (
        |  SELECT *, CAST(sum(flag) OVER (PARTITION BY user_id
        |    ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM f),
        |sess AS (
        |  SELECT user_id, session_idx, count(*) AS n_events,
        |    (max(tsn) - min(tsn)) // 1000000000 AS duration_s
        |  FROM s GROUP BY user_id, session_idx)
        |SELECT n_events, count(*) AS n_sessions,
        |  floor((CAST(CAST(sum(duration_s) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) * 1e2 + 0.5) / 1e2 AS avg_duration_s,
        |  max(duration_s) AS max_duration_s
        |FROM sess GROUP BY n_events ORDER BY n_events""".stripMargin,
    "q_sessionize" ->
      """WITH o AS (
        |  SELECT user_id, event_id, epoch_ns(ts) AS tsn FROM events),
        |f AS (
        |  SELECT *, CASE WHEN tsn - lag(tsn)
        |      OVER (PARTITION BY user_id ORDER BY tsn, event_id) > 21600000000000
        |    THEN 1 ELSE 0 END AS flag
        |  FROM o),
        |s AS (
        |  SELECT *, CAST(sum(flag) OVER (PARTITION BY user_id
        |    ORDER BY tsn, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM f)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  (max(tsn) - min(tsn)) // 1000000000 AS duration_s,
        |  min(event_id) AS first_event
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
  )
}
