package graft.ml

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

import org.apache.spark.ml.PipelineStage
import org.apache.spark.ml.feature.{OneHotEncoder, StandardScaler, StringIndexer, VectorAssembler}

/** Run configuration: JSON file → pipeline stages + model + target
  * parameters (reference configuration/__init__.py:60-340 +
  * configuration/standard.json). Defaults mirror the reference's
  * dataclass defaults; JSON keys override.
  */
case class PipelineConfig(raw: Map[String, Any]) {

  private def section(key: String): Map[String, Any] =
    raw.getOrElse(key, Map.empty[String, Any]) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty
    }

  def fillDefaultValues: Map[String, Any] = section("fill_default_values")
  def fillImputationStrategy: Map[String, String] =
    section("fill_imputation_strategy").map { case (k, v) => k -> v.toString }
  /** Per-feature transformer chains, with the reference's time-aggregate
    * duplication (configuration/__init__.py:295-310): every
    * `{variable}_{operation}{n}m` produced by `time_aggregation` inherits
    * the base variable's transformers — except `diff` variables, which
    * the reference deliberately leaves out. */
  def featuresTransformers: Map[String, Seq[String]] = {
    val base = section("features_transformers").map {
      case (k, v: Seq[_]) => k -> v.map(_.toString)
      case (k, v) => k -> Seq(v.toString)
    }
    val timeAgg = for {
      (op, feats) <- timeAggregation if op != "diff"
      (feat, months) <- feats if base.contains(feat)
      n <- months
    } yield s"${feat}_$op${n}m" -> base(feat)
    base ++ timeAgg
  }
  def ordinalEncodingBins: Map[String, Seq[Seq[Any]]] =
    section("ordinal_encoding_bins").map {
      case (k, v: Seq[_]) => k -> v.map {
        case b: Seq[_] => b.asInstanceOf[Seq[Any]]
        case b => Seq(b)
      }
      case (k, v) => k -> Seq(Seq(v))
    }
  def sirenAggregation: Map[String, String] = {
    val m = section("siren_aggregation").map { case (k, v) => k -> v.toString }
    if (m.nonEmpty) m
    else Map("cotisation" -> "sum", "dette_sociale_ouvrière" -> "sum",
      "dette_sociale_patronale" -> "sum", "effectif" -> "sum",
      "ap_heures_consommées" -> "sum")
  }
  /** function → feature → list of month horizons
    * (standard.json time_aggregation). */
  def timeAggregation: Map[String, Map[String, Seq[Int]]] =
    section("time_aggregation").map {
      case (fn, m: Map[_, _]) => fn -> m.asInstanceOf[Map[String, Any]].map {
        case (feat, ns: Seq[_]) => feat -> ns.map(_.toString.toDouble.toInt)
        case (feat, n) => feat -> Seq(n.toString.toDouble.toInt)
      }
      case (fn, _) => fn -> Map.empty[String, Seq[Int]]
    }
  def target: Map[String, Any] =
    if (section("target").nonEmpty) section("target")
    else Map("class_col" -> "failure", "n_months" -> 18,
      "judgment_date_col" -> "date_jugement",
      "target_resampling_ratio" -> 0.35,
      "resampling_method" -> "oversampling")
  def modelName: String =
    raw.getOrElse("model_name", "LogisticRegression").toString
  def modelParams: Map[String, Any] =
    section("model_params").get(modelName) match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty
    }
  def featuresColumn: String =
    raw.getOrElse("features_column", "features").toString

  private val encoderNames = Set("OneHotEncoder", "StringIndexer", "BinsOrdinalEncoder")
  private val scalerNames = Set("StandardScaler")

  /** The reference's encoding_scaling_stages
    * (configuration/__init__.py:342-473): per-feature encoder chains
    * (suffixes _ix/_onehot/_bin) → per-scaler dropper + assembler +
    * scaler → final dropper + assembler into `featuresColumn`. */
  def encodingScalingStages(): Seq[PipelineStage] = {
    val encodingSteps = Seq.newBuilder[PipelineStage]
    val scalerInputs = scala.collection.mutable.LinkedHashMap
      .empty[String, Vector[String]]
    val modelFeatures = Seq.newBuilder[String]

    for ((feature, transformers) <- featuresTransformers) {
      var colName = feature
      for (t <- transformers if encoderNames(t)) t match {
        case "StringIndexer" =>
          encodingSteps += new StringIndexer()
            .setInputCol(colName).setOutputCol(colName + "_ix")
          colName += "_ix"
        case "OneHotEncoder" =>
          encodingSteps += new OneHotEncoder().setDropLast(false)
            .setInputCol(colName).setOutputCol(colName + "_onehot")
          colName += "_onehot"
        case "BinsOrdinalEncoder" =>
          encodingSteps += new BinsOrdinalEncoder(colName,
            ordinalEncodingBins(feature))
          colName += "_bin"
      }
      transformers.lastOption match {
        case Some(s) if scalerNames(s) =>
          scalerInputs(s) = scalerInputs.getOrElse(s, Vector.empty) :+ colName
        case _ => modelFeatures += colName
      }
    }

    val scalingSteps = scalerInputs.toSeq.flatMap { case (scaler, inputs) =>
      modelFeatures += s"${scaler}_output"
      Seq(
        new MissingValuesDropper(inputs),
        new VectorAssembler().setInputCols(inputs.toArray)
          .setOutputCol(s"${scaler}_input"),
        new StandardScaler().setWithMean(true).setWithStd(true)
          .setInputCol(s"${scaler}_input").setOutputCol(s"${scaler}_output"))
    }

    val features = modelFeatures.result()
    val groupingSteps = Seq(
      new MissingValuesDropper(features),
      new VectorAssembler().setInputCols(features.toArray)
        .setOutputCol(featuresColumn))

    encodingSteps.result() ++ scalingSteps ++ groupingSteps
  }
}

object PipelineConfig {
  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  def fromJson(json: String): PipelineConfig =
    PipelineConfig(mapper.readValue(json, classOf[Map[String, Any]]))

  /** CLI-style overrides: highest-precedence source in the reference's
    * resolution order — dataclass defaults < config file < CLI args
    * (configuration/__init__.py:251-258, 267-275). Top-level keys
    * replace wholesale, as `dict.update` does. */
  implicit class ConfigOps(private val c: PipelineConfig) extends AnyVal {
    def withOverrides(cli: Map[String, Any]): PipelineConfig =
      PipelineConfig(c.raw ++ cli)
  }

  def fromFile(path: String): PipelineConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  /** Serialize the resolved configuration back to JSON (the reference
    * dumps the run config next to predictions,
    * configuration/__init__.py:312-340). */
  def toJson(c: PipelineConfig): String =
    mapper.writeValueAsString(c.raw)
}
