package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Group-wise train/test split (reference model_selection.py:8-69):
  * the split happens over DISTINCT group values (no group straddles the
  * boundary — no entity leakage), materialized with two left-semi joins.
  */
object ModelSelection {

  def trainTestSplit(
      df: DataFrame,
      randomSeed: Long,
      trainSize: Option[Double] = None,
      testSize: Option[Double] = None,
      groupCol: Option[String] = Some("siren")): (DataFrame, DataFrame) = {

    val (tr, te) = (trainSize, testSize) match {
      case (None, None) => (0.8, 0.2)
      case (None, Some(t)) => (1 - t, t)
      case (Some(t), None) => (t, 1 - t)
      case (Some(a), Some(b)) =>
        require(math.abs(a + b - 1) < 1e-9,
          "train_size and test_size should sum to 1."); (a, b)
    }

    groupCol match {
      case Some(g) =>
        val groups = df.select(col(g)).distinct()
        require(groups.limit(2).count() >= 2,
          "`df` should contain at least 2 independent entities.")
        val Array(gTrain, gTest) =
          groups.randomSplit(Array(tr, te), randomSeed)
        (df.join(gTrain, Seq(g), "left_semi"),
          df.join(gTest, Seq(g), "left_semi"))
      case None =>
        val Array(a, b) = df.randomSplit(Array(tr, te), randomSeed)
        (a, b)
    }
  }
}
