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

  /** Holdout metric frames, evaluated once per (session, dir) — both the
    * metric queries and the gates on the importances/serving queries read
    * these (evalClassifier/evalRegressor localCheckpoint their 1-row
    * output, so the memoized frame is a materialized scalar, not a
    * re-scoring plan). */
  private val clsMetricsMemo = new SessionMemo[String, DataFrame]
  private val regMetricsMemo = new SessionMemo[String, DataFrame]

  private def cachedClassifierMetrics(spark: SparkSession, dir: String): DataFrame =
    clsMetricsMemo.getOrElseUpdate(spark, dir) {
      val (_, test) = Pipelines.temporalSplit(cachedFeatures(spark, dir), 7)
      Pipelines.evalClassifier(cachedClassifier(spark, dir).transform(test))
    }

  private def cachedRegressorMetrics(spark: SparkSession, dir: String): DataFrame =
    regMetricsMemo.getOrElseUpdate(spark, dir) {
      val (_, test) = Pipelines.temporalSplit(cachedFeatures(spark, dir), 7)
      Pipelines.evalRegressor(cachedRegressor(spark, dir).transform(test))
    }

  /** Zero-or-one-row marker used to gate a dependent query's rows on a
    * model-quality gate: cross-joining against it is a no-op while the
    * gate holds and annihilates the result when it fails. */
  private def gateMarker(metrics: DataFrame, gate: org.apache.spark.sql.Column): DataFrame =
    metrics.filter(gate).select(lit(1).as("gate_ok"))

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
    * AUC + accuracy + confusion counts. Rows-only, but GATED in-plan
    * (Pipelines.classifierGate): the single metric row vanishes if the
    * seeded model stops clearing the measured AUC/accuracy floors or the
    * confusion matrix goes inconsistent, so the driver's spark_rows=1 is
    * a live quality check. */
  def qMlClassifier(spark: SparkSession, dir: String): DataFrame =
    cachedClassifierMetrics(spark, dir).filter(Pipelines.classifierGate)

  /** M6: named, ranked GBT feature importances from the (seeded,
    * deterministic) classifier — ref classifier.py:96-100 (rows-only:
    * importances are model internals, not SQL-expressible). Gated twice:
    * on internal consistency (complete slate, non-negative, sums to 1,
    * not degenerate-sparse) and on the classifier quality gate — junk
    * model ⇒ zero rows. */
  def qMlImportances(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val imp = Pipelines.featureImportances(cachedClassifier(spark, dir))
      .toDF("feature", "importance")
    val consistency = imp.agg(
      count(lit(1)).as("n_imp"),
      sum(col("importance")).as("sum_imp"),
      min(col("importance")).as("min_imp"),
      sum(when(col("importance") > 0, 1).otherwise(0)).as("nz_imp"))
    imp.crossJoin(broadcast(consistency))
      .filter(col("n_imp") === Pipelines.AssembledFeatureNames.length &&
        abs(col("sum_imp") - 1.0) < 1e-6 && col("min_imp") >= 0 &&
        col("nz_imp") >= 3)
      .crossJoin(broadcast(gateMarker(
        cachedClassifierMetrics(spark, dir), Pipelines.classifierGate)))
      .select(col("feature"), rnd(col("importance"), 6).as("importance"))
      .orderBy(desc("importance"), col("feature"))
  }

  /** M9-M12: direction-weighted GBT return regressor, RMSE/MSE/MAE/R² +
    * directional accuracy. Rows-only but gated in-plan
    * (Pipelines.regressorGate — directional-accuracy floor; see the gate
    * Scaladoc for why R² cannot be the floor on this data). */
  def qMlRegressor(spark: SparkSession, dir: String): DataFrame =
    cachedRegressorMetrics(spark, dir).filter(Pipelines.regressorGate)

  /** M15-M16: ranked serving output — top predicted next-step returns on
    * the holdout. Gated on the regressor quality gate: if the model that
    * produced the ranking stops clearing its floors, the served rows
    * vanish with it. */
  def qMlServe(spark: SparkSession, dir: String): DataFrame = {
    val (_, test) = Pipelines.temporalSplit(cachedFeatures(spark, dir), 7)
    // gate the SCORED frame, then rank — the ranking orderBy+limit must
    // stay the plan's top-level sort (a sort below a join confers no
    // output ordering, and this query is documented as ranked output)
    val gated = cachedRegressor(spark, dir).transform(test)
      .crossJoin(broadcast(gateMarker(
        cachedRegressorMetrics(spark, dir), Pipelines.regressorGate)))
      .drop("gate_ok")
    Pipelines.servePredictions(gated, topK = 20)
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
