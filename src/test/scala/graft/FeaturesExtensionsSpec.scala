package graft

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.Features

class FeaturesExtensionsSpec extends SparkSpec {

  test("vector disassembly recovers names from ml_attr metadata") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 10.0), ("b", 2.0, 20.0)).toDF("id", "x", "y")
    val assembled = new VectorAssembler()
      .setInputCols(Array("x", "y")).setOutputCol("features")
      .transform(df)
    assert(Features.featureNames(assembled, "features") == Seq("x", "y"))
    val back = Features.disassemble(assembled, "features", Seq("id"))
    assert(back.columns.toSeq == Seq("id", "x", "y"))
    assert(back.orderBy("id").collect().map(_.getDouble(1)).toSeq ==
      Seq(1.0, 2.0))
  }

  test("GraftExtensions registers graft_dot_product for SQL") {
    // the shared test JVM already has a session, so exercise the same
    // injection the extension performs via the function registry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import graft.functions.expressions.DotProduct
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // builds without error
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_product",
      exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    val out = spark.sql(
      "SELECT graft_dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .first().getDouble(0)
    assert(out == 11.0)
  }
}
