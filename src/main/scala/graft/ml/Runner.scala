package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.{LogisticRegressionModel, ProbabilisticClassificationModel, RandomForestClassificationModel}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The train/predict run (reference __main__.py — SURVEY.md §3.1):
  * load → preprocess (encoding/scaling pipeline) → date-based +
  * group-wise split → resample → fit → score → explain → alert levels.
  *
  * Differences from the reference, all same-semantics:
  *  - the preprocessed dataset is cached once and reused by the three
  *    downstream splits (the reference does the same via .cache());
  *  - threshold tuning and explanation run distributed (no driver
  *    collect of scores / no Python shap) — see Evaluation / Explain.
  */
object Runner {

  case class RunResult(
    model: ProbabilisticClassificationModel[_, _],
    trainScored: DataFrame,
    testScored: DataFrame,
    predictionScored: DataFrame,
    thresholds: Map[Double, Double],
    metrics: Map[String, Double])

  def run(spark: SparkSession, dataset: DataFrame, config: PipelineConfig,
      randomSeed: Long = 42L,
      sampleRatio: Option[Double] = None): RunResult = {

    val target = config.target
    val classCol = target("class_col").toString
    val timeCol = "période"

    // 1. optional sampling (reference __main__.py:146-149)
    val sampled = sampleRatio.fold(dataset)(r =>
      dataset.sample(withReplacement = false, r, randomSeed))

    // 2. preprocessing pipeline fit + transform, cached for the splits
    val stages = config.encodingScalingStages()
    val prepared = new Pipeline().setStages(stages.toArray)
      .fit(sampled).transform(sampled).cache()

    // 3. date-range train window / prediction date + group-wise split
    val trainDates = config.raw.get("train_dates") match {
      case Some(s: Seq[_]) if s.length == 2 =>
        (s.head.toString, s(1).toString)
      case _ => ("2016-01-01", "2019-05-31")
    }
    val predictionDate =
      config.raw.getOrElse("prediction_date", "2020-02-01").toString
    val trainWindow = prepared.filter(
      col(timeCol) >= lit(trainDates._1) && col(timeCol) <= lit(trainDates._2))
    val predictionSet = prepared.filter(col(timeCol) === lit(predictionDate))
    val trainSize = config.raw.getOrElse("train_size", 0.8).toString.toDouble
    val (train, test) = ModelSelection.trainTestSplit(trainWindow,
      randomSeed, trainSize = Some(trainSize), groupCol = Some("siren"))

    // 4. resample the train set (reference __main__.py:184-190)
    val resampled = new RandomResampler(classCol,
      target("target_resampling_ratio").toString.toDouble,
      target("resampling_method").toString, randomSeed).transform(train)

    // 5. fit + score
    val estimator = Models.getModel(config.modelName, config.modelParams,
      config.featuresColumn, classCol)
    val model = estimator.fit(resampled)
      .asInstanceOf[ProbabilisticClassificationModel[_, _]]
    def score(df: DataFrame): DataFrame =
      model.transform(df).withColumn("probability_1",
        vector_to_array(col("probability"))(1))
    val trainScored = score(train)
    val testScored = score(test)
    val predictionScored = score(predictionSet)

    // 6. threshold tuning + metrics on the test set
    val thresholds = Evaluation.optimalBetaThresholds(
      testScored, classCol, "probability_1")
    val metrics = Evaluation.metrics(testScored, classCol, "probability_1")

    RunResult(model, trainScored, testScored, predictionScored,
      thresholds, metrics)
  }

  /** Explanation stage (reference __main__.py:200-243): linear SHAP for
    * LR, exact TreeSHAP for forests (the reference's TreeExplainer). */
  def explain(result: RunResult, df: DataFrame): DataFrame =
    result.model match {
      case lr: LogisticRegressionModel =>
        Explain.linearShap(lr, df)
      case rf: RandomForestClassificationModel =>
        TreeShap.forestShap(
          org.apache.spark.ml.tree.GraftTreeAccess.rootsOf(rf),
          rf.numFeatures, df)
      case gbt: org.apache.spark.ml.classification.GBTClassificationModel =>
        TreeShap.gbtShap(
          org.apache.spark.ml.tree.GraftTreeAccess.rootsOfGbt(gbt),
          gbt.treeWeights, gbt.numFeatures, df)
      case other => throw new IllegalArgumentException(
        s"no explainer for ${other.getClass.getSimpleName}")
    }
}
