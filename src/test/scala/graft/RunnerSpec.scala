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

  test("reference standard.json drives the full config path end-to-end " +
      "(configuration/standard.json + resolution order __init__.py:244-310)") {
    import graft.ml.PipelineConfig.ConfigOps

    // the reference's production config, ported verbatim as a fixture
    val cfg0 = PipelineConfig.fromFile(
      "src/test/resources/reference_standard.json")
    // CLI-style overrides (highest precedence), shrinking the date span
    // to the synthetic panel below
    val cfg = cfg0.withOverrides(Map(
      "train_dates" -> Seq("2018-01-01", "2019-05-31"),
      "prediction_date" -> "2020-02-01"))

    // features_transformers + time_aggregation → transformer chains:
    // mean/lag products inherit the base feature's scalers, diff is
    // deliberately excluded (configuration/__init__.py:295-310)
    val ft = cfg.featuresTransformers
    assert(ft("cotisation_mean12m") == Seq("StandardScaler"))
    for (n <- Seq(1, 2, 3, 6, 12)) {
      assert(ft(s"dette_sociale_ouvrière_lag${n}m") == Seq("StandardScaler"))
      assert(ft(s"dette_sociale_patronale_lag${n}m") == Seq("StandardScaler"))
    }
    assert(!ft.contains("paydex_diff12m"))
    assert(!ft.contains("dette_par_effectif_diff3m"))
    assert(ft("paydex") == Seq("BinsOrdinalEncoder", "OneHotEncoder"))
    // 24 scaler-terminated base features + mean + 10 lags = 35
    assert(ft.count(_._2.lastOption.contains("StandardScaler")) == 35)
    assert(cfg.ordinalEncodingBins("paydex").length == 6)
    // no model_params section → reference dataclass defaults
    assert(cfg.modelName == "LogisticRegression")
    assert(cfg.modelParams.isEmpty)
    assert(cfg.fillDefaultValues("paydex") == 0)

    // synthetic panel with every column the config references (the
    // time-aggregate columns exist upstream of these stages in the
    // reference's pipeline, so the fixture provides them directly)
    val scalerFeatures = ft.collect {
      case (f, ts) if ts.lastOption.contains("StandardScaler") => f
    }.toSeq.sorted
    val rng = new Random(11)
    val months = (0 until 26).map(m =>
      java.sql.Date.valueOf(f"${2018 + m / 12}-${m % 12 + 1}%02d-01"))
    val rows = (0 until 150).flatMap { i =>
      val siren = f"$i%09d"
      val failing = rng.nextDouble() < 0.3
      months.map { period =>
        val base = if (failing) 60.0 + rng.nextDouble() * 60
          else rng.nextDouble() * 40
        Row.fromSeq(
          Seq(siren, period, if (failing) 1 else 0,
            // paydex within the bin range, non-null
            rng.nextDouble() * 120 - 10) ++
          scalerFeatures.map(_ => base + rng.nextDouble() * 10))
      }
    }
    val schema = StructType(
      Seq(StructField("siren", StringType),
        StructField("période", DateType),
        StructField("failure", IntegerType),
        StructField("paydex", DoubleType)) ++
      scalerFeatures.map(StructField(_, DoubleType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8), schema)

    // the encoding/scaling stages include the config-driven
    // BinsOrdinalEncoder (M4) — and the full run trains and scores
    val stages = cfg.encodingScalingStages()
    assert(stages.exists(_.isInstanceOf[graft.ml.BinsOrdinalEncoder]))
    val result = Runner.run(spark, df, cfg, randomSeed = 42)
    assert(result.predictionScored.count() > 0)
    assert(result.testScored.count() > 0)
    // the features vector = onehot(6 paydex bins) + StandardScaler output
    val vecSize = result.testScored
      .select(org.apache.spark.ml.functions.vector_to_array(
        org.apache.spark.sql.functions.col(cfg.featuresColumn)))
      .first().getSeq[Double](0).size
    assert(vecSize == 6 + 35, s"features vector size $vecSize")
    assert(result.metrics("Area under ROC curve") > 0.8,
      result.metrics.toString)
  }

  test("RunPipeline CLI: config + overrides → panel → outputs on disk") {
    import graft.ml.PipelineConfig.ConfigOps
    // same verbatim-ported standard.json; the panel mirrors the
    // config-path test's shape
    val cfg = PipelineConfig.fromFile(
      "src/test/resources/reference_standard.json")
    val scalerFeatures = cfg.featuresTransformers.collect {
      case (f, ts) if ts.lastOption.contains("StandardScaler") => f
    }.toSeq.sorted
    val rng = new Random(23)
    val months = (0 until 26).map(m =>
      java.sql.Date.valueOf(f"${2018 + m / 12}-${m % 12 + 1}%02d-01"))
    val rows = (0 until 120).flatMap { i =>
      val siren = f"$i%09d"
      val failing = rng.nextDouble() < 0.3
      months.map { period =>
        val base = if (failing) 60.0 + rng.nextDouble() * 60
          else rng.nextDouble() * 40
        Row.fromSeq(Seq(siren, period, if (failing) 1 else 0,
          rng.nextDouble() * 120 - 10) ++
          scalerFeatures.map(_ => base + rng.nextDouble() * 10))
      }
    }
    val schema = StructType(
      Seq(StructField("siren", StringType),
        StructField("période", DateType),
        StructField("failure", IntegerType),
        StructField("paydex", DoubleType)) ++
      scalerFeatures.map(StructField(_, DoubleType)))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_runpipeline").toString
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 8), schema)
      .write.mode("overwrite").parquet(s"$tmp/panel.parquet")

    RunPipeline.run(spark, "src/test/resources/reference_standard.json",
      s"$tmp/panel.parquet", s"$tmp/out",
      Map("train_dates" -> Seq("2018-01-01", "2019-05-31"),
        "prediction_date" -> "2020-02-01"))

    val preds = spark.read.parquet(s"$tmp/out/predictions.parquet")
    assert(preds.count() > 0)
    assert(preds.columns.contains("probability_1"))
    val docs = spark.read.json(s"$tmp/out/frontend.json")
    assert(docs.count() === preds.count())
    val metrics = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tmp/out/metrics.json")), "UTF-8")
    assert(metrics.contains("threshold_f05") &&
      metrics.contains("Area under ROC curve"), metrics)
  }

  test("RunPipeline override coercion follows the config key's type") {
    val cfg = PipelineConfig.fromJson(
      """{"a": ["x","y"], "b": 3, "c": 0.5, "d": true, "e": "plain"}""")
    val coerced = RunPipeline.coerce(cfg, Map(
      "a" -> "p,q", "b" -> "7", "c" -> "0.25", "d" -> "false",
      "e" -> "has,comma", "new_key" -> "1,2"))
    assert(coerced("a") === Seq("p", "q"))
    assert(coerced("b") === 7L)
    assert(coerced("c") === 0.25)
    assert(coerced("d") === false)
    // a SCALAR key's value may legitimately contain a comma
    assert(coerced("e") === "has,comma")
    // unknown keys stay strings (no type to coerce toward)
    assert(coerced("new_key") === "1,2")
    // already-typed values (spec-passed) pass through untouched
    assert(RunPipeline.coerce(cfg, Map("a" -> Seq("z")))("a") === Seq("z"))
  }
}
