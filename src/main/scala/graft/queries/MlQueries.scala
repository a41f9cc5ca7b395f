package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ml.Pipelines

/** ML training/eval/serving surface (SURVEY.md §2.10) as verifiable
  * queries. Training metrics are model-dependent, so the GBT queries are
  * rows-only (driver records a weaker check); the whitelist query (M14,
  * the reference's train-category filter, ml_impl.py:124-125) is pure
  * relational and fully oracle-checked.
  */
object MlQueries {

  /** Shared-feature memo (M15 made literal): the three training queries
    * reuse ONE cached feature frame and ONE fitted regressor per
    * (session, dir) instead of re-deriving and re-training — in a Verify/
    * Bench run that executes all ML queries this is a 3× saving, and it
    * mirrors production, where the feature table and model are artifacts,
    * not per-query recomputations. */
  private val featureMemo = new SessionMemo[String, DataFrame]
  private val regressorMemo = new SessionMemo[String, org.apache.spark.ml.PipelineModel]
  private val classifierMemo = new SessionMemo[String, org.apache.spark.ml.PipelineModel]

  private def cachedFeatures(spark: SparkSession, dir: String): DataFrame =
    featureMemo.getOrElseUpdate(spark, dir) {
      val f = Pipelines.featureFrame(spark, dir).cache()
      f.count() // materialize once
      f
    }

  private def cachedRegressor(spark: SparkSession, dir: String): org.apache.spark.ml.PipelineModel =
    regressorMemo.getOrElseUpdate(spark, dir) {
      val (train, _) = Pipelines.temporalSplit(cachedFeatures(spark, dir), 7)
      Pipelines.trainRegressor(train, maxIter = 10)
    }

  private def cachedClassifier(spark: SparkSession, dir: String): org.apache.spark.ml.PipelineModel =
    classifierMemo.getOrElseUpdate(spark, dir) {
      val (train, _) = Pipelines.temporalSplit(cachedFeatures(spark, dir), 7)
      Pipelines.trainClassifier(train, maxIter = 10)._1
    }

  /** M14+P8: serving-time whitelist — events in the 7-day holdout keep
    * only users seen in training; per-user event counts. */
  def qMlWhitelist(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val cutoff = e.agg((max(col("ts")) - lit(7L * 86400L * 1000000000L)).as("cutoff"))
    val tagged = e.crossJoin(broadcast(cutoff))
    val train = tagged.filter(col("ts") < col("cutoff"))
    val test = tagged.filter(col("ts") >= col("cutoff"))
    test
      .join(train.select("user_id").distinct(), Seq("user_id"), "left_semi")
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** M1-M6: class-weighted GBT direction classifier, temporal split,
    * AUC + accuracy + confusion counts (rows-only). */
  def qMlClassifier(spark: SparkSession, dir: String): DataFrame = {
    val (_, test) = Pipelines.temporalSplit(cachedFeatures(spark, dir), 7)
    Pipelines.evalClassifier(cachedClassifier(spark, dir).transform(test))
  }

  /** M6: named, ranked GBT feature importances from the (seeded,
    * deterministic) classifier — ref classifier.py:96-100 (rows-only:
    * importances are model internals, not SQL-expressible). */
  def qMlImportances(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Pipelines.featureImportances(cachedClassifier(spark, dir))
      .toDF("feature", "importance")
      .select(col("feature"), rnd(col("importance"), 6).as("importance"))
      .orderBy(desc("importance"), col("feature"))
  }

  /** M9-M12: direction-weighted GBT return regressor, RMSE/MSE/MAE/R² +
    * directional accuracy (rows-only). */
  def qMlRegressor(spark: SparkSession, dir: String): DataFrame = {
    val (_, test) = Pipelines.temporalSplit(cachedFeatures(spark, dir), 7)
    Pipelines.evalRegressor(cachedRegressor(spark, dir).transform(test))
  }

  /** M15-M16: ranked serving output — top predicted next-step returns on
    * the holdout (rows-only). */
  def qMlServe(spark: SparkSession, dir: String): DataFrame = {
    val (_, test) = Pipelines.temporalSplit(cachedFeatures(spark, dir), 7)
    Pipelines.servePredictions(cachedRegressor(spark, dir).transform(test), topK = 20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_whitelist" -> qMlWhitelist _,
    "q_ml_classifier" -> qMlClassifier _,
    "q_ml_importances" -> qMlImportances _,
    "q_ml_regressor" -> qMlRegressor _,
    "q_ml_serve" -> qMlServe _,
  )

  val oracles: Map[String, String] = Map(
    "q_ml_whitelist" ->
      """SELECT user_id, count(*) AS n_events
        |FROM events e, (SELECT max(ts) - INTERVAL 7 DAY AS cutoff FROM events) c
        |WHERE e.ts >= c.cutoff
        |  AND EXISTS (SELECT 1 FROM events t,
        |              (SELECT max(ts) - INTERVAL 7 DAY AS cutoff FROM events) c2
        |              WHERE t.ts < c2.cutoff AND t.user_id = e.user_id)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
