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
  private val featureMemo = new SessionMemo[String, DataFrame]("featureMemo")
  private val regressorMemo = new SessionMemo[String, org.apache.spark.ml.PipelineModel]("regressorMemo")
  private val classifierMemo = new SessionMemo[String, org.apache.spark.ml.PipelineModel]("classifierMemo")

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
  private val clsMetricsMemo = new SessionMemo[String, DataFrame]("clsMetricsMemo")
  private val regMetricsMemo = new SessionMemo[String, DataFrame]("regMetricsMemo")

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

  /** The (max train ts, min test ts) pair of the shared 7-day temporal
    * split, as a 1-row broadcastable frame — the split-leakage
    * certificate both metric certs carry. */
  private def splitBounds(spark: SparkSession, dir: String): DataFrame = {
    val (train, test) = Pipelines.temporalSplit(cachedFeatures(spark, dir), 7)
    train.agg(max(col("ts")).as("train_max_ts"))
      .crossJoin(broadcast(test.agg(min(col("ts")).as("test_min_ts"))))
  }

  /** THEOREM-CERTIFICATE forms of the four model-metric queries (VERDICT
    * r9 ask #6 — the q_sketch_lean pattern): model metrics are not
    * SQL-oracle-able, but their INVARIANTS are booleans the DuckDB
    * oracle pins to literal TRUE, which moves these entries from the
    * driver's rows-only count onto its cell-exact compare. The booleans
    * are computed from the UNGATED metric frames, so a floor violation
    * or broken invariant shows up as a FALSE cell (hash mismatch → red),
    * not as a silently absent row; an empty/degenerate split nulls the
    * leakage certificate, which mismatches TRUE just the same. The rich
    * metric rows stay available as [[qMlClassifier]]/[[qMlRegressor]]
    * (API + MlSpec surface); the registered queries are these. */
  def qMlClassifierCert(spark: SparkSession, dir: String): DataFrame =
    cachedClassifierMetrics(spark, dir)
      .crossJoin(broadcast(splitBounds(spark, dir)))
      .select(
        (col("train_max_ts") < col("test_min_ts")).as("split_leakfree"),
        (!isnan(col("auc")) && col("auc") > Pipelines.AucFloor &&
          col("auc") <= 1.0).as("auc_ok"),
        (col("accuracy") >= Pipelines.AccuracyFloor &&
          col("accuracy") <= 1.0).as("accuracy_ok"),
        (col("n") > 0 &&
          (col("tp") + col("fp") + col("fn") + col("tn") === col("n")) &&
          (col("n_correct") === col("tp") + col("tn"))).as("confusion_ok"))

  /** Regressor certificates: the split-leakage bound, the directional-
    * accuracy floor, finiteness/sign of the error metrics, and mae ≤
    * rmse — a THEOREM (power-mean inequality) for any unweighted error
    * distribution, so a FALSE here means the metrics were computed over
    * different populations (the ε absorbs last-ulp rounding at
    * equality). */
  def qMlRegressorCert(spark: SparkSession, dir: String): DataFrame =
    cachedRegressorMetrics(spark, dir)
      .crossJoin(broadcast(splitBounds(spark, dir)))
      .select(
        (col("train_max_ts") < col("test_min_ts")).as("split_leakfree"),
        (col("dir_accuracy") >= Pipelines.DirAccuracyFloor &&
          col("dir_accuracy") <= 1.0 && col("n") > 0).as("dir_ok"),
        (!isnan(col("rmse")) && col("rmse") >= 0 && col("rmse") < Double.MaxValue &&
          !isnan(col("mae")) && col("mae") >= 0 && col("mae") < Double.MaxValue)
          .as("err_finite_ok"),
        (col("mae") <= col("rmse") + lit(1e-9)).as("mae_le_rmse"),
        (!isnan(col("r2")) && col("r2") <= 1.0 &&
          col("r2") >= lit(Double.MinValue)).as("r2_ok"))

  /** Importances certificates: the feature SLATE is exact (the literal
    * [[Pipelines.AssembledFeatureNames]], oracle-pinned row for row,
    * ordered by name — the importance-ranked view stays on
    * [[qMlImportances]]), plus the non-negativity / sums-to-one /
    * completeness invariants as TRUE-pinned booleans. Cross-joined
    * against the classifier quality gate: a junk model zeroes the rows
    * (mismatch vs the oracle's 9). */
  def qMlImportancesCert(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val imp = Pipelines.featureImportances(cachedClassifier(spark, dir))
      .toDF("feature", "importance")
    val consistency = imp.agg(
      count(lit(1)).as("n_imp"),
      sum(col("importance")).as("sum_imp"),
      sum(when(col("importance") > 0, 1).otherwise(0)).as("nz_imp"))
    imp.crossJoin(broadcast(consistency))
      .crossJoin(broadcast(gateMarker(
        cachedClassifierMetrics(spark, dir), Pipelines.classifierGate)))
      .select(
        col("feature"),
        (col("importance") >= 0).as("nonneg_ok"),
        (abs(col("sum_imp") - 1.0) < 1e-6).as("sums_to_one"),
        (col("n_imp") === Pipelines.AssembledFeatureNames.length &&
          col("nz_imp") >= 3).as("slate_ok"))
      .orderBy("feature")
  }

  /** Serving certificates over the SAME top-20 [[qMlServe]] emits: rank
    * 1..20 exact, every served row future-dated (ts ≥ the split cutoff)
    * and category-whitelisted (event_type seen by the regressor's
    * train-fitted StringIndexer — the P8 drop-unseen rule; the fit set
    * is the nonzero-target train rows), prediction finite. Regressor
    * quality gate kept: a junk model empties the result (0 vs 20 rows →
    * red). */
  def qMlServeCert(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val feats = cachedFeatures(spark, dir)
    val (train, test) = Pipelines.temporalSplit(feats, 7)
    val scored = cachedRegressor(spark, dir).transform(test)
      .crossJoin(broadcast(gateMarker(
        cachedRegressorMetrics(spark, dir), Pipelines.regressorGate)))
      .drop("gate_ok")
    val served = Pipelines.servePredictions(scored, topK = 20)
    // the SAME boundary definition the split itself uses — not a
    // re-derivation that could drift from temporalSplit's constant
    val cutoff = Pipelines.holdoutCutoff(feats, 7)
    val trainCats = train.filter(signum(col("target")) =!= 0)
      .select(col("event_type")).distinct().withColumn("cat_in_train", lit(1))
    // 20 rows by construction — the global window ranks the bounded
    // served set, not the corpus
    val w = Window.orderBy(desc("predicted_return"), col("event_id"))
    served
      .join(test.select("event_id", "ts", "event_type"), Seq("event_id"))
      .crossJoin(broadcast(cutoff))
      .join(broadcast(trainCats), Seq("event_type"), "left")
      .withColumn("rank", row_number().over(w))
      .select(
        col("rank"),
        (col("ts") >= col("cutoff")).as("in_holdout"),
        col("cat_in_train").isNotNull.as("category_whitelisted"),
        // abs(x) < MaxValue rejects ±Infinity too — a certificate named
        // "finite" must not pass an infinite prediction (isnan alone does)
        (!isnan(col("predicted_return")) &&
          abs(col("predicted_return")) < Double.MaxValue &&
          !isnan(col("predicted_value")) &&
          abs(col("predicted_value")) < Double.MaxValue).as("pred_finite"))
      .orderBy("rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ml_whitelist" -> qMlWhitelist _,
    "q_ml_classifier" -> qMlClassifierCert _,
    "q_ml_importances" -> qMlImportancesCert _,
    "q_ml_regressor" -> qMlRegressorCert _,
    "q_ml_serve" -> qMlServeCert _,
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
    // theorem-certificate oracles (VERDICT r9 ask #6): the invariants are
    // pinned TRUE; a floor violation or broken invariant on the Spark
    // side flips a cell and fails the hash compare
    "q_ml_classifier" ->
      """SELECT TRUE AS split_leakfree, TRUE AS auc_ok,
        |  TRUE AS accuracy_ok, TRUE AS confusion_ok""".stripMargin,
    "q_ml_regressor" ->
      """SELECT TRUE AS split_leakfree, TRUE AS dir_ok,
        |  TRUE AS err_finite_ok, TRUE AS mae_le_rmse, TRUE AS r2_ok""".stripMargin,
    "q_ml_importances" -> {
      val names = graft.ml.Pipelines.AssembledFeatureNames
        .map(n => s"('$n')").mkString(", ")
      s"""SELECT feature, TRUE AS nonneg_ok, TRUE AS sums_to_one, TRUE AS slate_ok
         |FROM (VALUES $names) t(feature) ORDER BY feature""".stripMargin
    },
    "q_ml_serve" ->
      """SELECT CAST(range + 1 AS INTEGER) AS rank, TRUE AS in_holdout,
        |  TRUE AS category_whitelisted, TRUE AS pred_finite
        |FROM range(20) ORDER BY rank""".stripMargin,
  )
}
