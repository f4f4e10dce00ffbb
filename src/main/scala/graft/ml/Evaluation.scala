package graft.ml

import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model evaluation (reference evaluation.py:17-101) — the reference
  * collects scores to the driver and sweeps thresholds with sklearn; we
  * run the whole sweep DISTRIBUTED: explode the threshold grid per row
  * (101× row multiplication, map-side combined immediately), one hash
  * aggregate for every confusion matrix at once. O(n·n_thr) work, O(n_thr)
  * result — no driver collect of scores.
  */
object Evaluation {

  /** Confusion counts for every threshold in an even [0,1] grid.
    * Output: (threshold, tp, fp, fn, tn). */
  def thresholdSweep(scored: DataFrame, labelCol: String, scoreCol: String,
      nThr: Int = 101): DataFrame = {
    val grid = typedLit((0 until nThr).map(i => i.toDouble / (nThr - 1)))
    scored
      .select(col(labelCol).cast("int").as("y"), col(scoreCol).as("s"),
        explode(grid).as("threshold"))
      .groupBy(col("threshold"))
      .agg(
        count(when(col("s") >= col("threshold") && col("y") === 1, 1)).as("tp"),
        count(when(col("s") >= col("threshold") && col("y") === 0, 1)).as("fp"),
        count(when(col("s") < col("threshold") && col("y") === 1, 1)).as("fn"),
        count(when(col("s") < col("threshold") && col("y") === 0, 1)).as("tn"))
  }

  /** F_beta per threshold, computed from the sweep (sklearn convention:
    * 0 when denominator is 0). */
  def fBeta(sweep: DataFrame, beta: Double): DataFrame = {
    val b2 = beta * beta
    sweep.withColumn("fbeta",
      when((lit(1 + b2) * col("tp") + col("fp") + lit(b2) * col("fn")) === 0, 0.0)
        .otherwise(lit(1 + b2) * col("tp") /
          (lit(1 + b2) * col("tp") + col("fp") + lit(b2) * col("fn"))))
  }

  /** Thresholds maximizing F_beta for each requested beta (reference
    * optimal_beta_thresholds; ties resolve to the smallest threshold,
    * matching numpy argmax). */
  def optimalBetaThresholds(scored: DataFrame, labelCol: String,
      scoreCol: String, betas: Seq[Double] = Seq(0.5, 2.0),
      nThr: Int = 101): Map[Double, Double] = {
    val sweep = thresholdSweep(scored, labelCol, scoreCol, nThr).cache()
    try betas.map { beta =>
      val best = fBeta(sweep, beta)
        .orderBy(col("fbeta").desc, col("threshold").asc)
        .select(col("threshold")).first().getDouble(0)
      beta -> best
    }.toMap
    finally sweep.unpersist()
  }

  /** The reference's metrics dict (evaluation.py:58-101): confusion
    * matrix, F_beta, precision, recall, balanced accuracy, AUC-PR,
    * ROC-AUC — AUCs via BinaryClassificationEvaluator, the rest from one
    * aggregate at `thresh`. */
  def metrics(scored: DataFrame, labelCol: String, scoreCol: String,
      beta: Double = 1.0, thresh: Double = 0.5): Map[String, Double] = {
    val row = scored.select(
      count(when(col(scoreCol) >= thresh && col(labelCol) === 1, 1)).as("tp"),
      count(when(col(scoreCol) >= thresh && col(labelCol) === 0, 1)).as("fp"),
      count(when(col(scoreCol) < thresh && col(labelCol) === 1, 1)).as("fn"),
      count(when(col(scoreCol) < thresh && col(labelCol) === 0, 1)).as("tn"))
      .first()
    val (tp, fp, fn, tn) = (row.getLong(0).toDouble, row.getLong(1).toDouble,
      row.getLong(2).toDouble, row.getLong(3).toDouble)
    val precision = if (tp + fp == 0) 0.0 else tp / (tp + fp)
    val recall = if (tp + fn == 0) 0.0 else tp / (tp + fn)
    val specificity = if (tn + fp == 0) 0.0 else tn / (tn + fp)
    val b2 = beta * beta
    val fbeta =
      if ((1 + b2) * tp + fp + b2 * fn == 0) 0.0
      else (1 + b2) * tp / ((1 + b2) * tp + fp + b2 * fn)
    val ev = new BinaryClassificationEvaluator()
      .setLabelCol(labelCol).setRawPredictionCol(scoreCol)
    val aucPr = ev.setMetricName("areaUnderPR").evaluate(scored)
    val rocAuc = ev.setMetricName("areaUnderROC").evaluate(scored)
    Map("TP" -> tp, "FP" -> fp, "FN" -> fn, "TN" -> tn,
      s"F$beta-score" -> fbeta, "Precision" -> precision, "Recall" -> recall,
      "Balanced accuracy" -> (recall + specificity) / 2.0,
      "Area under Precision-Recall curve" -> aucPr,
      "Area under ROC curve" -> rocAuc)
  }
}
