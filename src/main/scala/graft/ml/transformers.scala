package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.feature.{Bucketizer, Imputer}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ColumnOps
import graft.operators.TimeOps

/** The reference's custom pyspark.ml Transformers re-expressed as Spark
  * ML `Transformer`s (SURVEY.md §2.11), so they compose in
  * `org.apache.spark.ml.Pipeline` stages exactly like the reference's
  * preprocessing pipeline (reference configuration/__init__.py:342-430).
  *
  * Entity/time columns default to the reference's ("siren", "période")
  * but are constructor-parameterized — the engine is generic past the
  * reference schema.
  */
abstract class SimpleTransformer(prefix: String) extends Transformer {
  override val uid: String = Identifiable.randomUID(prefix)
  override def copy(extra: ParamMap): this.type = this
  override def transformSchema(schema: StructType): StructType = schema
}

/** Zero-left-pads an identifier column (reference transform.py:365-418). */
class IdentifierNormalizer(inputCol: String, nPad: Int = 9)
    extends SimpleTransformer("identifierNormalizer") {
  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF.withColumn(inputCol, ColumnOps.padId(col(inputCol), nPad))
}

/** siren from a 14-char siret (reference transform.py:421-468). */
class SiretToSiren(inputCol: String = "siret", outputCol: String = "siren")
    extends SimpleTransformer("siretToSiren") {
  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF.withColumn(outputCol, ColumnOps.siretToSiren(col(inputCol)))
}

/** Parses a string date column (reference transform.py:101-112). */
class DateParser(inputCol: String, outputCol: String, format: String)
    extends SimpleTransformer("dateParser") {
  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF.withColumn(outputCol, to_date(col(inputCol), format))
}

/** Fills missing values with either explicit `value`s or a `strategy` ∈
  * {mean, median, mode, bfill, ffill} (reference transform.py:170-293).
  * Median follows the reference's "n/2-th sample" convention — Spark's
  * Imputer (approxQuantile at relativeError 0) reproduces it.
  */
class MissingValuesHandler(
    inputCols: Seq[String],
    value: Map[String, Any] = null,
    strategy: String = null,
    entityCol: String = "siren",
    timeCol: String = "période")
    extends SimpleTransformer("missingValuesHandler") {

  require((value == null) != (strategy == null),
    "Either `value` or `strategy` must be set (mutually exclusive).")

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF
    if (value != null) {
      df.na.fill(value.filter { case (k, _) => inputCols.contains(k) })
    } else strategy match {
      case "bfill" => TimeOps.bfill(df, Seq(entityCol), timeCol, inputCols)
      case "ffill" => TimeOps.ffill(df, Seq(entityCol), timeCol, inputCols)
      case s @ ("mean" | "median" | "mode") =>
        val imputer = new Imputer()
          .setStrategy(s)
          .setInputCols(inputCols.toArray)
          .setOutputCols(inputCols.toArray)
          .setRelativeError(0.0)
        imputer.fit(df).transform(df)
      case other => throw new IllegalArgumentException(
        s"Unknown strategy '$other'")
    }
  }
}

/** Drops rows with nulls in `inputCols`, skipping complex-typed columns
  * (reference transform.py:296-355 MissingValuesDropper; the skip-list
  * is Array/Map/Struct/UserDefinedType per transform.py:322-329 — UDT
  * matters because the reference runs droppers after VectorAssembler
  * stages, so `VectorUDT` columns must pass through untouched). */
class MissingValuesDropper(inputCols: Seq[String])
    extends SimpleTransformer("missingValuesDropper") {
  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF
    val droppable = inputCols.filter { c =>
      df.schema(c).dataType match {
        case _: ArrayType | _: MapType | _: StructType => false
        case _: UserDefinedType[_] => false
        case _ => true
      }
    }
    df.na.drop("any", droppable)
  }
}

/** Row-lag on the month index (reference LagOperator,
  * transform.py:683-764). Output `{col}_lag{n}m`. */
class LagOperator(inputCol: String, nMonths: Int,
    entityCol: String = "siren", timeCol: String = "période")
    extends SimpleTransformer("lagOperator") {
  override def transform(ds: Dataset[_]): DataFrame =
    TimeOps.lag_(ds.toDF, Seq(entityCol), timeCol, Seq(inputCol), nMonths)
}

/** `x - lag(x, n)` (reference DiffOperator, transform.py:767-843).
  * Output `{col}_diff{n}m`. */
class DiffOperator(inputCol: String, nMonths: Int,
    entityCol: String = "siren", timeCol: String = "période")
    extends SimpleTransformer("diffOperator") {
  override def transform(ds: Dataset[_]): DataFrame =
    TimeOps.diff(ds.toDF, Seq(entityCol), timeCol, Seq(inputCol), nMonths)
}

/** Calendar moving average, inclusive frame of n+1 months (reference
  * MovingAverage, transform.py:601-680). Output `{col}_mean{n}m`. */
class MovingAverage(inputCol: String, nMonths: Int,
    entityCol: String = "siren", timeCol: String = "période")
    extends SimpleTransformer("movingAverage") {
  override def transform(ds: Dataset[_]): DataFrame =
    TimeOps.movingAverage(ds.toDF, Seq(entityCol), timeCol, Seq(inputCol),
      nMonths)
}

/** Per-entity linear interpolation of interior null gaps (reference
  * LinearInterpolationOperator, transform.py:939-1054). */
class LinearInterpolationOperator(inputCols: Seq[String],
    entityCol: String = "siren", timeCol: String = "période")
    extends SimpleTransformer("linearInterpolation") {
  override def transform(ds: Dataset[_]): DataFrame =
    TimeOps.interpolate(ds.toDF, Seq(entityCol), timeCol, inputCols)
}

/** Ordinal encoding by value bins — wraps Bucketizer with configured
  * splits (reference BinsOrdinalEncoder, transform.py:115-168).
  * `bins` are [lo, hi] pairs as in configuration/standard.json:108-135;
  * "-inf"/"inf" strings map to ±Infinity. Output `{col}_bin`. */
class BinsOrdinalEncoder(inputCol: String, bins: Seq[Seq[Any]],
    outputSuffix: String = "_bin")
    extends SimpleTransformer("binsOrdinalEncoder") {
  private def bound(v: Any): Double = v match {
    case "-inf" => Double.NegativeInfinity
    case "inf" | "+inf" => Double.PositiveInfinity
    case d: Double => d
    case i: Int => i.toDouble
    case l: Long => l.toDouble
    case b: BigInt => b.toDouble
    case s: String => s.toDouble
    case other => throw new IllegalArgumentException(s"bad bin bound $other")
  }
  override def transform(ds: Dataset[_]): DataFrame = {
    // the reference takes np.unique over ALL flattened bounds
    // (transform.py:160-161) — sorted distinct, not assumed-contiguous
    val splits = bins.flatten.map(bound).distinct.sorted.toArray
    new Bucketizer()
      .setInputCol(inputCol)
      .setOutputCol(inputCol + outputSuffix)
      .setSplits(splits)
      .transform(ds)
  }
  // declare the output column: Pipeline.fit validates every stage's
  // schema up front, so downstream stages (e.g. the OneHotEncoder that
  // follows in standard.json's paydex chain) must see `{col}_bin` here
  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields :+
      StructField(inputCol + outputSuffix, DoubleType, nullable = true))
}

/** Map-form keyed aggregator as a pipeline stage (reference
  * SirenAggregator, transform.py:471-539): aggregates `aggMap` columns
  * per `groupingCols`, keeps output names identical, re-attaches
  * non-aggregated columns via distinct + left join. */
class SirenAggregator(groupingCols: Seq[String] = Seq("siren", "période"),
    aggMap: Map[String, String])
    extends SimpleTransformer("sirenAggregator") {
  override def transform(ds: Dataset[_]): DataFrame =
    graft.operators.Aggregates.keyedAggregate(ds.toDF, groupingCols, aggMap)
}

/** Binary failure target: `add_months(time, n) >= eventDate`, null → 0
  * (reference TargetVariable, transform.py:846-894). */
class TargetVariable(inputCol: String, outputCol: String, nMonths: Int,
    timeCol: String = "période")
    extends SimpleTransformer("targetVariable") {
  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF.withColumn(outputCol,
        (add_months(col(timeCol), nMonths) >= col(inputCol))
          .cast(IntegerType))
      .na.fill(Map(outputCol -> 0))
}

/** Keeps private companies only (reference transform.py:897-916). */
class PrivateCompanyFilter extends SimpleTransformer("privateCompanyFilter") {
  override def transform(ds: Dataset[_]): DataFrame = {
    require(ds.columns.contains("code_naf"), "Dataset has no 'code_naf' column.")
    ds.toDF.filter("code_naf NOT IN ('O', 'P')")
  }
}

/** Keeps rows with paydex data (reference transform.py:919-936). */
class HasPaydexFilter extends SimpleTransformer("hasPaydexFilter") {
  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF.filter(col("paydex").isNotNull
      && col("paydex_diff12m").isNotNull)
}

/** Resamples a binary-labelled dataset to a requested minority-class
  * ratio (reference RandomResampler, transform.py:1057-1161):
  * undersampling subsamples the majority class without replacement;
  * oversampling samples the minority class with replacement. Only the
  * O(#classes) counts reach the driver. */
class RandomResampler(classCol: String, minClassRatio: Double,
    method: String, seed: Long)
    extends SimpleTransformer("randomResampler") {
  require(method == "undersampling" || method == "oversampling",
    s"Unknown resampling method $method.")

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF
    val counts = df.groupBy(col(classCol)).count()
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    require(counts.size > 1, "There is only 1 class in the dataset.")
    val majLabel = counts.maxBy(_._2)._1
    val minLabel = counts.minBy(_._2)._1
    val majDf = df.filter(col(classCol) === majLabel)
    val minDf = df.filter(col(classCol) === minLabel)
    val majRatio = 1.0 - minClassRatio
    if (method == "undersampling") {
      val subsetSize = (counts(minLabel) / minClassRatio).toLong
      val targetMaj = (majRatio * subsetSize).toLong
      majDf.sample(withReplacement = false,
          targetMaj.toDouble / counts(majLabel), seed)
        .union(minDf)
    } else {
      val subsetSize = (counts(majLabel) / majRatio).toLong
      val targetMin = (minClassRatio * subsetSize).toLong
      minDf.sample(withReplacement = true,
          targetMin.toDouble / counts(minLabel), seed)
        .union(majDf)
    }
  }
}
