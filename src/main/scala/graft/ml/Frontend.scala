package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Front-end document generation (reference
  * postprocessing/generate_frontend_document.py:200-271 and
  * predictions.py:12-38): alert levels from the two F-beta-optimal
  * thresholds, per-company JSON documents, and latest-wins prediction
  * merge. All column math and `to_json` — distributed end to end.
  */
object Frontend {

  /** Alert levels from the F0.5 (strong) and F2 (moderate) thresholds:
    * alert_group = 2 - (p < t(F0.5)) - (p < t(F2)); decoded to the
    * reference's labels. */
  def withAlerts(predictions: DataFrame, scoreCol: String,
      thresholdF05: Double, thresholdF2: Double): DataFrame = {
    val group = (lit(2)
      - when(col(scoreCol) < thresholdF05, 1).otherwise(0)
      - when(col(scoreCol) < thresholdF2, 1).otherwise(0))
    predictions
      .withColumn("alert_group", group)
      .withColumn("alert",
        when(col("alert_group") === 0, "Pas d'alerte")
          .when(col("alert_group") === 1, "Alerte seuil F2")
          .otherwise("Alerte seuil F1/2"))
  }

  /** Per-company front-end JSON documents: risk percentage, alert
    * level, thresholds, plus macro/micro explanation maps for alerted
    * companies (reference output_entries structure). Output:
    * (siren, doc json string). */
  def frontendDocuments(predictions: DataFrame, idCol: String,
      scoreCol: String, thresholdF05: Double, thresholdF2: Double,
      explanationCols: Seq[String] = Nil): DataFrame = {
    val alerted = withAlerts(predictions, scoreCol, thresholdF05, thresholdF2)
      .withColumn("Risque de défaillance", col(scoreCol) * 100)
      .withColumn("Seuil modéré", lit(thresholdF2))
      .withColumn("Seuil fort", lit(thresholdF05))
    val baseFields = Seq(col(idCol).as("siren"),
      col("Risque de défaillance"), col("alert"),
      col("Seuil modéré"), col("Seuil fort"))
    val explFields =
      if (explanationCols.isEmpty) Seq.empty
      else Seq(when(col("alert") =!= "Pas d'alerte",
        struct(explanationCols.map(col): _*)).as("macroExpl"))
    alerted.select(col(idCol).as("siren"),
      to_json(struct(baseFields ++ explFields: _*)).as("doc"))
  }

  /** Latest-wins merge of several prediction lists on the company id
    * (reference predictions.py:12-38): later frames override earlier
    * ones per siren — max_by over a priority rank, one hash aggregate. */
  def mergePredictions(predictionFrames: Seq[DataFrame],
      idCol: String): DataFrame = {
    require(predictionFrames.nonEmpty)
    val tagged = predictionFrames.zipWithIndex.map { case (df, i) =>
      df.withColumn("__priority", lit(i))
    }.reduce(_ unionByName _)
    val valueCols = tagged.columns.filterNot(c =>
      c == idCol || c == "__priority").toSeq
    tagged.groupBy(col(idCol))
      .agg(max_by(struct(valueCols.map(col): _*), col("__priority")).as("__v"))
      .select(col(idCol) +: valueCols.map(c => col(s"__v.$c").as(c)): _*)
  }
}
