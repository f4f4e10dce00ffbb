package graft.ml

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.classification.{GBTClassifier, LogisticRegression, RandomForestClassifier}

/** Classifier factory with the reference's hyper-parameters as defaults
  * (reference configuration/__init__.py:85-121). */
object Models {

  def defaultParams: Map[String, Map[String, Any]] = Map(
    "LogisticRegression" -> Map(
      "regParam" -> 0.12, "maxIter" -> 500, "tol" -> 1e-5,
      "standardization" -> false),
    "RandomForestClassifier" -> Map(
      "maxDepth" -> 9, "numTrees" -> 100),
    "GBTClassifier" -> Map(
      "maxDepth" -> 3, "maxIter" -> 100, "maxBins" -> 255,
      "minInstancesPerNode" -> 1, "stepSize" -> 0.025))

  private def dbl(v: Any): Double = v match {
    case d: Double => d; case i: Int => i.toDouble; case l: Long => l.toDouble
    case b: BigInt => b.toDouble; case b: BigDecimal => b.toDouble
    case s: String => s.toDouble
    case other => throw new IllegalArgumentException(s"not numeric: $other")
  }
  private def int(v: Any): Int = dbl(v).toInt
  private def bool(v: Any): Boolean = v match {
    case b: Boolean => b; case s: String => s.toBoolean
    case other => throw new IllegalArgumentException(s"not boolean: $other")
  }

  /** Instantiate a classifier by name, merging `params` over the
    * reference defaults. */
  def getModel(name: String,
      params: Map[String, Any] = Map.empty,
      featuresCol: String = "features",
      labelCol: String = "failure"): Estimator[_] = {
    val p = defaultParams.getOrElse(name, Map.empty) ++ params
    name match {
      case "LogisticRegression" =>
        val m = new LogisticRegression()
          .setFeaturesCol(featuresCol).setLabelCol(labelCol)
        p.get("regParam").foreach(v => m.setRegParam(dbl(v)))
        p.get("maxIter").foreach(v => m.setMaxIter(int(v)))
        p.get("tol").foreach(v => m.setTol(dbl(v)))
        p.get("standardization").foreach(v => m.setStandardization(bool(v)))
        p.get("elasticNetParam").foreach(v => m.setElasticNetParam(dbl(v)))
        m
      case "RandomForestClassifier" =>
        val m = new RandomForestClassifier()
          .setFeaturesCol(featuresCol).setLabelCol(labelCol)
        p.get("maxDepth").foreach(v => m.setMaxDepth(int(v)))
        p.get("numTrees").foreach(v => m.setNumTrees(int(v)))
        p.get("maxBins").foreach(v => m.setMaxBins(int(v)))
        p.get("seed").foreach(v => m.setSeed(dbl(v).toLong))
        m
      case "GBTClassifier" =>
        val m = new GBTClassifier()
          .setFeaturesCol(featuresCol).setLabelCol(labelCol)
        p.get("maxDepth").foreach(v => m.setMaxDepth(int(v)))
        p.get("maxIter").foreach(v => m.setMaxIter(int(v)))
        p.get("maxBins").foreach(v => m.setMaxBins(int(v)))
        p.get("minInstancesPerNode").foreach(v => m.setMinInstancesPerNode(int(v)))
        p.get("stepSize").foreach(v => m.setStepSize(dbl(v)))
        p.get("seed").foreach(v => m.setSeed(dbl(v).toLong))
        m
      case other =>
        throw new IllegalArgumentException(s"Unknown model name $other")
    }
  }
}
