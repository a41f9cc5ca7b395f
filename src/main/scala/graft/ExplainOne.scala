package graft

import org.apache.spark.sql.SparkSession

/** Plan dumper: `runMain graft.ExplainOne <query> [sfDir] [mode]` —
  * prints one query's plan (`formatted` by default; any
  * Dataset.explain mode). The PLANS.md evidence comes from here plus
  * one executed run (AQE final plans print after execution), so the
  * documented shapes are real output, not hand-drawn. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainOne <queryName> [sfDir] [mode]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = fn(spark, sfDir)
    df.queryExecution.toRdd.count() // execute so AQE's final plan is the printed one
    println(s"=== $name ($mode, $sfDir) ===")
    df.explain(mode)
    spark.stop()
  }
}
