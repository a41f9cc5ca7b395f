package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-category query groups under graft.queries.* into the
  * single map the driver's Verify/Bench harness consumes. Every query takes
  * (spark, sfDir) and returns a deterministic, oracle-comparable DataFrame.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (SURVEY §7.2 slice:
    * scan → window features → join → agg → top-k); driver smoke-checks
    * rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val features = graft.ml.Pipelines.featureFrame(spark, dir)
    val userDim = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max(col("value")).as("max_value"))
    features
      .join(broadcast(userDim), "user_id")
      .filter(col("rsi14").isNotNull)
      .orderBy(desc("macd"), col("event_id"))
      .limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.TimeSeriesQueries.queries ++
    graft.queries.TextStats.queries ++
    graft.queries.TextDedup.queries ++
    graft.queries.SimilarityQueries.queries ++
    graft.queries.MlQueries.queries ++
    graft.queries.ScalarQueries.queries ++
    graft.queries.TemporalJoinQueries.queries ++
    graft.queries.TrainingDataQueries.queries ++
    graft.queries.MultimodalQueries.queries ++
    graft.queries.SourceQueries.queries ++
    graft.queries.StatQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
    graft.queries.TimeSeriesQueries.oracles ++
    graft.queries.TextOracles.oracles ++
    graft.queries.SimilarityQueries.oracles ++
    graft.queries.MlQueries.oracles ++
    graft.queries.ScalarQueries.oracles ++
    graft.queries.TemporalJoinQueries.oracles ++
    graft.queries.TrainingDataQueries.oracles ++
    graft.queries.MultimodalQueries.oracles ++
    graft.queries.SourceQueries.oracles ++
    graft.queries.StatQueries.oracles
}
