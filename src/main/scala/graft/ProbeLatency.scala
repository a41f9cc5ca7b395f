package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic (r15): decompose per-action vs per-stage latency. */
object ProbeLatency {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String, reps: Int)(f: () => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      val warm = ts.drop(reps / 2)
      println(f"[probe] $name: median=${warm.sorted.apply(warm.size / 2)}%.4f s  (cold=${ts.head}%.3f)")
    }
    // UNMEMOIZED reader for the resolution probes: Tables.read memoizes
    // per (session, dir, table) — measuring through it would time a
    // TrieMap hit after rep 1 (review r15). This is the raw resolution
    // path the memo exists to avoid; the memoized path is what the
    // queries below (and the whole query layer) actually pay. The
    // legacy-nanos flag is part of that path (Tables.read sets it) and
    // the older TIMESTAMP(NANOS) fixture vintage needs it before the
    // first footer read — set once here.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val evRaw = () => Tables.normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
    val ev = () => Tables.events(spark, sfDir)
    // 0a: relation resolution only (read.parquet + normalizeTs), unmemoized
    time("resolve_only", 20)(() => { evRaw(); () })
    // 0b: analysis+planning on a PRE-RESOLVED relation
    val resolved = evRaw()
    time("plan_on_resolved", 20)(() => resolved.select(col("event_id")).queryExecution.executedPlan)
    // 0: build + analyze through the UNMEMOIZED reader (the pre-memo per-query cost)
    time("analyze_only", 20)(() => evRaw().select(col("event_id")).queryExecution.executedPlan)
    // 0c: same through the memoized Tables.read (what queries now pay)
    time("analyze_memoized", 20)(() => ev().select(col("event_id")).queryExecution.executedPlan)
    // 1: noop RDD action on an already-planned query (reuse same DF)
    val planned = ev().select(col("event_id"), col("user_id"), col("value"))
    time("scan_count_reuse", 20)(() => { planned.queryExecution.toRdd.count(); () })
    // 2: fresh DF each rep: listing+analysis+scan
    time("scan_count_fresh", 20)(() => { ev().select(col("event_id")).queryExecution.toRdd.count(); () })
    // 3: one shuffle (groupBy)
    time("one_shuffle", 20)(() => { ev().groupBy(col("user_id")).count().queryExecution.toRdd.count(); () })
    // 4: shuffle + window (no final sort)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    time("window_noorder", 20)(() => { ev().select(col("event_id"), lag(col("value"), 1).over(w).as("l")).queryExecution.toRdd.count(); () })
    // 5: full q_lag_lead
    time("full_lag_lead", 20)(() => { SparkEntry.queries("q_lag_lead")(spark, sfDir).queryExecution.toRdd.count(); () })
    // 6: empty-ish job latency floor: parallelize count
    val rdd = spark.sparkContext.parallelize(1 to 32, 32)
    time("bare_job", 20)(() => { rdd.count(); () })
    // 7: two-stage bare shuffle RDD
    time("bare_shuffle_job", 20)(() => { rdd.map(x => (x % 4, 1)).reduceByKey(_ + _).count(); () })
    spark.stop()
  }
}
