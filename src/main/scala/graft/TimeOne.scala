package graft

import org.apache.spark.sql.SparkSession

/** Single-query profiler: `runMain graft.TimeOne <query> [sfDir] [reps]`.
  * Same session config and toRdd accounting as [[Bench]], but for ONE
  * query in isolation — the tool the bench Scaladoc prescribes for
  * "profile suspicious queries in isolation before optimizing them"
  * (shared-memo warmup and neighbor-query GC both contaminate in-bench
  * numbers). Prints per-rep seconds and the median; one table-count
  * warmup pass absorbs page-cache/codegen cost. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TimeOne <queryName> [sfDir] [reps]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "orders", "customer", "part", "events", "documents", "embeddings")
      .foreach(t => try Tables.read(spark, sfDir, t).count() catch { case _: Throwable => () })
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[timeone] $name rep $i: $sec%.3f s")
      sec
    }
    val median = times.sorted.apply(times.size / 2)
    println(f"[timeone] $name median-of-$reps: $median%.3f s")
    spark.stop()
  }
}
