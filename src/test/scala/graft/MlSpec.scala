package graft

import scala.util.Random

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ml._

/** Statistical-tolerance tests ported from the reference
  * (tests/test_transform.py:147-182, tests/test_model_selection.py:16-48)
  * plus pipeline/evaluation/explanation coverage. */
class MlSpec extends SparkSpec {

  /** Reference MockDataFrameGenerator analogue (tests/conftest.py:24-128):
    * (siren, periode, ca, ebe, category, label) panel. */
  private def mockPanel(nSiren: Int, rowsPerSiren: Int, seed: Int = 42): DataFrame = {
    val rng = new Random(seed)
    val rows = (0 until nSiren).flatMap { i =>
      val siren = f"${rng.nextInt(1000000000)}%09d"
      val n = math.max(1, rowsPerSiren + rng.nextInt(3) - 1)
      val label = if (rng.nextDouble() < 0.2) 1 else 0
      (0 until n).map { m =>
        Row(siren, java.sql.Date.valueOf(f"2019-${m % 12 + 1}%02d-01"),
          rng.nextInt(100), rng.nextDouble(), f"${rng.nextInt(1000)}%03d",
          label)
      }
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows),
      StructType(Seq(
        StructField("siren", StringType, nullable = false),
        StructField("periode", DateType, nullable = false),
        StructField("ca", IntegerType, nullable = true),
        StructField("ebe", DoubleType, nullable = true),
        StructField("category", StringType, nullable = true),
        StructField("label", IntegerType, nullable = true))))
  }

  private def minorityRatio(df: DataFrame): Double = {
    val counts = df.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    counts(1).toDouble / (counts(0) + counts(1))
  }

  test("RandomResampler oversampling hits requested ratio ±0.2 " +
      "(test_transform.py:160-172)") {
    val df = mockPanel(4000, 3).cache()
    val out = new RandomResampler("label", 0.4, "oversampling", seed = 7)
      .transform(df)
    val ratio = minorityRatio(out)
    assert(math.abs(ratio - 0.4) < 0.2, s"ratio $ratio")
  }

  test("RandomResampler undersampling hits requested ratio ±0.2 " +
      "(test_transform.py:173-182)") {
    val df = mockPanel(4000, 3).cache()
    val out = new RandomResampler("label", 0.5, "undersampling", seed = 7)
      .transform(df)
    val ratio = minorityRatio(out)
    assert(math.abs(ratio - 0.5) < 0.2, s"ratio $ratio")
  }

  test("train_test_split sizes ±0.02 and group-disjoint " +
      "(test_model_selection.py:16-48)") {
    val df = mockPanel(3000, 3).cache()
    val (train, test) =
      ModelSelection.trainTestSplit(df, randomSeed = 42,
        trainSize = Some(0.8), groupCol = Some("siren"))
    val total = df.count().toDouble
    val frac = train.count() / total
    assert(math.abs(frac - 0.8) < 0.05, s"train fraction $frac")
    assert(train.select("siren").intersect(test.select("siren")).count() == 0)
    assert(train.count() + test.count() == total)
  }

  test("config-driven encoding/scaling pipeline + LR fit + evaluation + SHAP") {
    val cfgJson =
      """{
        |  "features_transformers": {
        |    "ca": ["StandardScaler"],
        |    "ebe": ["StandardScaler"],
        |    "category": ["StringIndexer", "OneHotEncoder"]
        |  },
        |  "model_name": "LogisticRegression",
        |  "target": {"class_col": "label"}
        |}""".stripMargin
    val cfg = PipelineConfig.fromJson(cfgJson)
    val stages = cfg.encodingScalingStages()
    val df = mockPanel(500, 2).withColumn("ca", col("ca").cast(DoubleType))
      .cache()
    val prepared = new Pipeline().setStages(stages.toArray).fit(df)
      .transform(df)
    assert(prepared.columns.contains("features"))

    val model = Models.getModel("LogisticRegression",
        labelCol = "label")
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegression]
      .fit(prepared)
    val scored = model.transform(prepared)
      .withColumn("p1",
        org.apache.spark.ml.functions.vector_to_array(col("probability"))(1))
    assert(scored.count() > 0)

    // threshold sweep + metrics
    val thresholds = Evaluation.optimalBetaThresholds(scored, "label", "p1")
    assert(thresholds.keySet == Set(0.5, 2.0))
    assert(thresholds.values.forall(t => t >= 0.0 && t <= 1.0))
    val m = Evaluation.metrics(scored, "label", "p1")
    assert(m("TP") + m("FP") + m("FN") + m("TN") == scored.count())
    assert(m("Area under ROC curve") >= 0.0
      && m("Area under ROC curve") <= 1.0)

    // linear SHAP: contributions + expected value ≈ margin (log-odds)
    val lrm: LogisticRegressionModel = model
    val explained = Explain.linearShap(lrm, scored)
    val row = explained.select(
      aggregate(col("shap"), lit(0.0), (a, x) => a + x).as("sum_shap"),
      col("expected_value"), col("p1")).first()
    val margin = row.getDouble(0) + row.getDouble(1)
    val p = 1.0 / (1.0 + math.exp(-margin))
    assert(math.abs(p - row.getDouble(2)) < 1e-6,
      s"shap-reconstructed probability $p vs model ${row.getDouble(2)}")
  }

  test("forest Saabas contributions reconstruct the forest probability") {
    val df = mockPanel(300, 2).withColumn("ca", col("ca").cast(DoubleType))
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(Array("ca", "ebe")).setOutputCol("features")
      .transform(df)
    val rf = Models.getModel("RandomForestClassifier",
        params = Map("numTrees" -> 5, "maxDepth" -> 4, "seed" -> 1),
        labelCol = "label")
      .asInstanceOf[org.apache.spark.ml.classification.RandomForestClassifier]
    val model = rf.fit(assembled)
    val roots = org.apache.spark.ml.tree.GraftTreeAccess.rootsOf(model)
    val out = Explain.forestContributions(roots, nFeatures = 2,
      model.transform(assembled))
    val r = out.select(
      (col("bias") + aggregate(col("contrib"), lit(0.0), (a, x) => a + x))
        .as("recon"),
      org.apache.spark.ml.functions.vector_to_array(col("probability"))(1)
        .as("p1")).first()
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
      s"${r.getDouble(0)} vs ${r.getDouble(1)}")
  }

  test("correlation-dependent linear SHAP: local accuracy + independent-" +
      "feature reduction to interventional") {
    import org.apache.spark.ml.feature.VectorAssembler
    val rng = new Random(13)
    // independent features -> correlation_dependent == interventional
    val rows = (0 until 2000).map { _ =>
      val a = rng.nextGaussian(); val b = rng.nextGaussian()
      org.apache.spark.sql.Row(a, b, if (a + 0.5 * b > 0) 1 else 0)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows),
      StructType(Seq(
        StructField("a", DoubleType), StructField("b", DoubleType),
        StructField("label", IntegerType))))
    val assembled = new VectorAssembler().setInputCols(Array("a", "b"))
      .setOutputCol("features").transform(df)
    val lr = Models.getModel("LogisticRegression", labelCol = "label")
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegression]
      .fit(assembled)

    // same mean basis + same row order for both explainers
    val probe = assembled.orderBy("a", "b")
    val interventional = Explain.linearShap(lr, probe)
      .orderBy("a", "b").limit(20)
      .select("shap").collect().map(_.getAs[scala.collection.Seq[Double]](0))
    val correlated = Explain.correlationDependentLinearShap(lr,
        probe, nOrderings = 64)
      .orderBy("a", "b").limit(20)
      .select("shap", "expected_value", "features").collect()

    // local accuracy: bias + sum(phi) == margin, exactly
    correlated.foreach { r =>
      val phi = r.getAs[scala.collection.Seq[Double]](0)
      val margin = lr.coefficients.toArray
        .zip(r.getAs[org.apache.spark.ml.linalg.Vector](2).toArray)
        .map { case (w, x) => w * x }.sum + lr.intercept
      assert(math.abs(phi.sum + r.getDouble(1) - margin) < 1e-9)
    }
    // near-independence: phi close to interventional (sampling + moment
    // estimation noise only)
    correlated.map(_.getAs[scala.collection.Seq[Double]](0))
      .zip(interventional).foreach { case (c, i) =>
        c.zip(i).foreach { case (x, y) =>
          assert(math.abs(x - y) < 0.15, s"$x vs $y") }
      }
  }

  test("correlation-dependent SHAP wide-d broadcast matvec: equals the " +
      "codegen path and stays locally accurate at d=200") {
    import org.apache.spark.ml.linalg.Vectors
    def fitAndProbe(d: Int, n: Int) = {
      val rng = new Random(7)
      val data = (0 until n).map { _ =>
        val x = Array.fill(d)(rng.nextGaussian())
        (Vectors.dense(x), if (x.sum > 0) 1.0 else 0.0)
      }
      val df = spark.createDataFrame(data).toDF("features", "label")
      val lr = new org.apache.spark.ml.classification.LogisticRegression()
        .setMaxIter(5).fit(df)
      // moments must come from n ≥ d rows: a rank-deficient Σ breaks the
      // conditional-expectation telescoping (Σ·pinv(Σ) ≠ I)
      (lr, df)
    }

    // d=40 (> default threshold 32): broadcast-UDF path must equal the
    // d²-literal codegen path (same seed → same T, c)
    val (lr40, probe40) = fitAndProbe(40, 300)
    val viaBroadcast = Explain.correlationDependentLinearShap(lr40, probe40,
        nTrainSample = 300, nOrderings = 4)
      .limit(10).select("shap").collect()
      .map(_.getAs[scala.collection.Seq[Double]](0))
    val viaCodegen = Explain.correlationDependentLinearShap(lr40, probe40,
        nTrainSample = 300, nOrderings = 4, matvecCodegenMaxDim = 1000)
      .limit(10).select("shap").collect()
      .map(_.getAs[scala.collection.Seq[Double]](0))
    viaBroadcast.zip(viaCodegen).foreach { case (b, c) =>
      b.zip(c).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9, s"$x vs $y") }
    }

    // d=200: the literal path would emit 40k codegen terms; the broadcast
    // path must complete and satisfy exact local accuracy
    val (lr200, probe200) = fitAndProbe(200, 300)
    val wide = Explain.correlationDependentLinearShap(lr200, probe200,
        nTrainSample = 300, nOrderings = 2)
      .limit(10).select("shap", "expected_value", "features").collect()
    assert(wide.length == 10)
    wide.foreach { r =>
      val phi = r.getAs[scala.collection.Seq[Double]](0)
      val margin = lr200.coefficients.toArray
        .zip(r.getAs[org.apache.spark.ml.linalg.Vector](2).toArray)
        .map { case (w, x) => w * x }.sum + lr200.intercept
      assert(math.abs(phi.sum + r.getDouble(1) - margin) < 1e-6,
        s"local accuracy: ${phi.sum + r.getDouble(1)} vs $margin")
    }
  }
}
