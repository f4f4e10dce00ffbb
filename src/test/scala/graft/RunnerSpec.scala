package graft

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ml.{PipelineConfig, Runner}

/** End-to-end train/predict run over a synthetic failure panel. */
class RunnerSpec extends SparkSpec {

  test("full run: preprocess, split, resample, fit, score, thresholds") {
    val rng = new Random(7)
    val rows = (0 until 400).flatMap { i =>
      val siren = f"$i%09d"
      val failing = rng.nextDouble() < 0.3
      (0 until 24).map { m =>
        val period = java.sql.Date.valueOf(
          f"${2016 + m / 12}-${m % 12 + 1}%02d-01")
        // failing companies have higher debt
        val debt = if (failing) 50.0 + rng.nextDouble() * 100
          else rng.nextDouble() * 30
        Row(siren, period, debt, rng.nextDouble() * 100,
          if (failing) 1 else 0)
      }
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows),
      StructType(Seq(
        StructField("siren", StringType), StructField("période", DateType),
        StructField("dette", DoubleType), StructField("ca", DoubleType),
        StructField("failure", IntegerType))))

    val cfg = PipelineConfig.fromJson(
      """{
        |  "features_transformers": {
        |    "dette": ["StandardScaler"],
        |    "ca": ["StandardScaler"]
        |  },
        |  "train_dates": ["2016-01-01", "2017-06-30"],
        |  "prediction_date": "2017-12-01",
        |  "model_name": "LogisticRegression",
        |  "target": {"class_col": "failure", "n_months": 18,
        |    "judgment_date_col": "date_jugement",
        |    "target_resampling_ratio": 0.4,
        |    "resampling_method": "oversampling"}
        |}""".stripMargin)

    val result = Runner.run(spark, df, cfg, randomSeed = 42)
    assert(result.testScored.count() > 0)
    assert(result.predictionScored.count() > 0)
    // debt strongly separates classes → model should discriminate
    assert(result.metrics("Area under ROC curve") > 0.9,
      result.metrics.toString)
    assert(result.thresholds.keySet == Set(0.5, 2.0))

    // explanation reconstructs probabilities (linear SHAP + sigmoid)
    val explained = Runner.explain(result, result.testScored.limit(10))
    assert(explained.columns.contains("shap"))
  }
}
