package graft

import org.apache.spark.sql.functions._

import graft.functions.expressions.VectorExpressions.{cosine_native, dot_product}

class VectorExpressionSpec extends SparkSpec {

  test("native dot_product matches the HOF fold on doubles and floats") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0, 5.0, 6.0)),
      (Array(0.5f, -1.5f, 2.25f), Array(-2.0, 0.25, 8.0)))
      .toDF("vf", "vd")
    val hof = aggregate(
      zip_with(col("vf").cast("array<double>"), col("vd"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(dot_product(col("vf"), col("vd")).as("native"),
      hof.as("fold")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("native dot_product is null-safe and handles empty arrays") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0))),
      (None, Some(Array(1.0))),
      (Some(Array.empty[Double]), Some(Array.empty[Double])))
      .toDF("a", "b")
    val rows = df.select(dot_product(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("native cosine participates in codegen and matches Similarity.cosine") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = emb.select(col("vec_id").as("i"), col("embedding").as("va")).limit(50)
    val b = emb.select(col("vec_id").as("j"), col("embedding").as("vb")).limit(50)
    val joined = a.crossJoin(b)
    val rows = joined.select(
      cosine_native(col("va"), col("vb")).as("native"),
      graft.operators.Similarity.cosine(col("va"), col("vb")).as("lib"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    // the plan stays inside whole-stage codegen (no CodegenFallback);
    // execute first so AQE finalizes the physical plan
    val probe = joined.select(cosine_native(col("va"), col("vb")))
    probe.collect()
    val planStr = probe.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(planStr.linesIterator.exists(l =>
      l.contains("*(") && l.contains("dotproduct")), planStr)
  }
}
