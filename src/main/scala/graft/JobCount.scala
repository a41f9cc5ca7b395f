package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger

/** Stage-overhead profiler: `runMain graft.JobCount <query> [sfDir]` —
  * times three executions of one query and reports the Spark job /
  * stage / task counts per execution. The companion to [[TimeOne]]
  * (wall time) and [[ExplainOne]] (plan shape): when a query's data is
  * small but its wall time is large, the job count says whether the
  * cost is scheduling overhead (many query stages — look for
  * recomputed subtrees that exchange reuse should collapse) or real
  * work. Found the q_dedup_indexed r10 regression: 20 jobs/84 tasks
  * per warm rep from four rebuilds of the verify-shingle subtree. */
object JobCount {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val fn = SparkEntry.queries(name)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0); val stages = new AtomicInteger(0); val tasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(e.stageInfo.numTasks)
      }
    })
    for (rep <- 1 to 3) {
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      // drain the async listener bus before reading/resetting counters —
      // in-flight events would otherwise undercount this rep and bleed
      // into the next one's counts (review r10 find)
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
      println(f"[jobcount] $name rep $rep: $sec%.2f s  jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
    }
    spark.stop()
  }
}
