package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-category query groups under graft.queries.* into the
  * single map the driver's Verify/Bench harness consumes. Every query takes
  * (spark, sfDir) and returns a deterministic, oracle-comparable DataFrame.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_join_star")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.TimeSeriesQueries.queries ++
    graft.queries.TextQueries.queries ++
    graft.queries.SimilarityQueries.queries ++
    graft.queries.MlQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
    graft.queries.TimeSeriesQueries.oracles ++
    graft.queries.TextQueries.oracles ++
    graft.queries.SimilarityQueries.oracles ++
    graft.queries.MlQueries.oracles
}
