package graft.ml

import org.apache.spark.ml.attribute.AttributeGroup
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-vector utilities (reference F1 vector_disassembler,
  * transform.py:28-60 + utils.py:49-67 feature-name recovery).
  *
  * The reference uses a Python UDF to turn `ml.Vector`s back into
  * columns; Spark's built-in `vector_to_array` + positional selects do
  * it codegen'd, with names recovered from the `ml_attr` metadata that
  * VectorAssembler writes.
  */
object Features {

  /** Feature names attached to an assembled vector column, from its
    * ML attribute metadata (reference utils.py:49-67). Falls back to
    * positional names when metadata is absent. */
  def featureNames(df: DataFrame, vectorCol: String): Seq[String] = {
    val group = AttributeGroup.fromStructField(df.schema(vectorCol))
    group.attributes match {
      case Some(attrs) => attrs.zipWithIndex.map { case (a, i) =>
        a.name.getOrElse(s"${vectorCol}_$i")
      }.toSeq
      case None =>
        val n = group.size max 0
        (0 until n).map(i => s"${vectorCol}_$i")
    }
  }

  /** Disassemble a vector column into one column per feature, keeping
    * `keepCols` (reference transform.py:28-60, inverse of
    * VectorAssembler). */
  def disassemble(df: DataFrame, vectorCol: String,
      keepCols: Seq[String]): DataFrame = {
    val names = featureNames(df, vectorCol)
    val arr = vector_to_array(col(vectorCol))
    df.select(keepCols.map(col) ++
      names.zipWithIndex.map { case (n, i) => arr(i).as(n) }: _*)
  }
}
