package graft.ml

import org.apache.commons.math3.distribution.FDistribution

import org.apache.spark.mllib.linalg.{Vectors => OldVectors}
import org.apache.spark.mllib.linalg.distributed.RowMatrix
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-exploration utilities (reference exploration.py:35-403):
  * one-way ANOVA, SVD eigenspace construction, and eigenspace
  * projection over time.
  *
  * Deviations from the reference, all same-result:
  *  - ANOVA squared-difference terms are plain column arithmetic, not
  *    Python UDFs (reference F1/F2 — SURVEY.md §2.9);
  *  - the p-value uses commons-math3's F distribution instead of scipy;
  *  - eigen-projection is DISTRIBUTED (broadcast V·S⁻¹, row-wise matmul
  *    in a select) instead of the reference's driver-side
  *    collect + numpy matmul + per-period union loop
  *    (exploration.py:252-283,334-363) — the projection runs in one pass
  *    at any scale.
  */
object Exploration {

  case class AnovaResult(fStatistic: Double, pValue: Double, sswg: Double,
    ssbg: Double, dfWg: Long, dfBg: Long)

  /** One-way ANOVA of `continuousVar` across `categoricalVar` groups
    * (reference exploration.py:103-152). */
  def oneWayAnova(df: DataFrame, categoricalVar: String,
      continuousVar: String): AnovaResult = {
    val groups = df.groupBy(col(categoricalVar)).agg(
      avg(col(continuousVar)).as("group_avg"),
      stddev(col(continuousVar)).as("group_sse"),
      count(lit(1)).as("nobs_per_group"))
    val globalAvg = df.select(avg(col(continuousVar))).first().getDouble(0)
    val agg = groups.select(
      sum(col("nobs_per_group")
        * pow(lit(globalAvg) - col("group_avg"), 2)).as("ssbg"),
      sum((col("nobs_per_group") - 1) * pow(col("group_sse"), 2)).as("sswg"),
      count(lit(1)).as("n_groups"),
      sum(col("nobs_per_group")).as("n_rows")).first()
    val ssbg = agg.getDouble(0)
    val sswg = agg.getDouble(1)
    val dfBg = agg.getLong(2) - 1
    val dfWg = agg.getLong(3) - agg.getLong(2) - 1
    val f = (ssbg / dfBg) / (sswg / dfWg)
    val p = 1.0 - new FDistribution(dfBg.toDouble, dfWg.toDouble)
      .cumulativeProbability(f)
    AnovaResult(f, p, sswg, ssbg, dfWg, dfBg)
  }

  case class Eigenspace(s: Array[Double], explainedVariance: Double,
    projection: Array[Array[Double]]) // projection = V · diag(1/s), d × k

  /** SVD eigenspace of the feature matrix (reference
    * exploration.py:155-180): top-k singular values, cumulative explained
    * variance, and the d×k projection matrix V·S⁻¹. */
  def buildEigenspace(df: DataFrame, features: Seq[String],
      k: Int): Eigenspace = {
    val rows = df.select(features.map(col): _*).rdd
      .map(r => OldVectors.dense(
        features.indices.map(i => r.getAs[Any](i) match {
          case d: Double => d
          case f: Float => f.toDouble
          case i2: Int => i2.toDouble
          case l: Long => l.toDouble
          case null => 0.0
        }).toArray))
    val svd = new RowMatrix(rows).computeSVD(features.length, computeU = false)
    val s = svd.s.toArray
    val s2 = s.map(x => x * x)
    val total = s2.sum
    val explained = s2.take(k).sum / total
    val v = svd.V.toArray // column-major d×d
    val d = features.length
    val proj = Array.tabulate(d, k)((row, c) => v(c * d + row) / s(c))
    Eigenspace(s.take(k), explained, proj)
  }

  /** Distributed projection of rows onto an eigenspace: each row's
    * feature vector x becomes x · (V·S⁻¹); the tiny projection matrix
    * travels as a literal (broadcast with the plan). Output keeps
    * `keyCols` plus cp1..cpk. */
  def projectOnEigenspace(df: DataFrame, space: Eigenspace,
      features: Seq[String], keyCols: Seq[String]): DataFrame = {
    val k = space.projection.head.length
    val comps = (0 until k).map { c =>
      features.zipWithIndex.map { case (f, i) =>
        col(f) * lit(space.projection(i)(c))
      }.reduce(_ + _).as(s"cp${c + 1}")
    }
    df.select(keyCols.map(col) ++ comps: _*)
  }

  /** Eigenspace trajectories (reference exploration.py:304-363): build
    * the eigenspace from the FIRST period in [start, end), then project
    * every period's observations onto it — one distributed pass, no
    * per-period loop. */
  def projectOverTime(df: DataFrame, start: String, end: String,
      features: Seq[String], entityCol: String = "siren",
      timeCol: String = "période"): DataFrame = {
    val inRange = df.filter(col(timeCol) >= lit(start)
      && col(timeCol) < lit(end))
    val firstPeriod = inRange.select(min(col(timeCol))).first().get(0)
    val space = buildEigenspace(
      inRange.filter(col(timeCol) === lit(firstPeriod)), features, k = 2)
    projectOnEigenspace(inRange, space, features, Seq(entityCol, timeCol))
  }

  /** Value-distribution counts (reference exploration.py:47-65). */
  def distribution(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).count().orderBy(col(c))

  /** Column span (reference exploration.py:35-43). */
  def span(df: DataFrame, c: String): (Any, Any) = {
    val r = df.select(min(col(c)), max(col(c))).first()
    (r.get(0), r.get(1))
  }
}
