package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage time attribution for one query:
  * `runMain graft.StageProf <query> [sfDir] [reps]`.
  *
  * The missing third leg of the profiling triad — [[TimeOne]] gives the
  * wall, [[JobCount]] the job/stage/task counts, this one says WHERE the
  * wall goes: for each completed stage of a warm rep it prints the stage
  * wall (submission→completion), summed executor run/CPU time, shuffle
  * read/write bytes and record counts, so "7 jobs, 0.8 s" decomposes
  * into scheduling gaps vs real compute vs shuffle. Stages are listed in
  * completion order with the rep's total wall above them; the gap
  * between the summed stage walls and the rep wall is driver-side
  * (planning, AQE re-optimization, job submission latency). */
object StageProf {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProf <queryName> [sfDir] [reps]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    case class St(id: Int, nm: String, wallMs: Long, runMs: Long, cpuMs: Long,
                  tasks: Int, srBytes: Long, swBytes: Long, outRows: Long)
    val stages = ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        if (m != null) stages.synchronized {
          stages += St(i.stageId, i.name.takeWhile(_ != '\n').take(60), wall,
            m.executorRunTime, m.executorCpuTime / 1000000L, i.numTasks,
            m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
            m.outputMetrics.recordsWritten max m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    for (rep <- 1 to reps) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t2 = System.nanoTime()
      org.apache.spark.sql.GraftBridge.drainListenerBus(spark.sparkContext)
      val snap = stages.synchronized(stages.toVector)
      println(f"[stageprof] $name rep $rep: total=${(t2 - t0) / 1e9}%.3f s " +
        f"(construct=${(t1 - t0) / 1e9}%.3f exec=${(t2 - t1) / 1e9}%.3f) " +
        f"stages=${snap.size} stageWallSum=${snap.map(_.wallMs).sum / 1000.0}%.3f s")
      if (rep == reps) snap.sortBy(-_.wallMs).foreach { s =>
        println(f"[stageprof]   stage ${s.id}%4d wall=${s.wallMs}%5d ms run=${s.runMs}%5d ms " +
          f"cpu=${s.cpuMs}%5d ms tasks=${s.tasks}%3d srB=${s.srBytes}%9d swB=${s.swBytes}%9d " +
          f"outRows=${s.outRows}%8d ${s.nm}")
      }
    }
    spark.stop()
  }
}
