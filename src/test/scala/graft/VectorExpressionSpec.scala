package graft

import org.apache.spark.sql.functions.{col, round => sqlRound}

/** Gates for the native Jaro-Winkler expression: classic golden
  * values, boundary cases, and whole-stage codegen participation. */
class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.expressions.StringSimilarity.jaro_winkler

  test("classic golden values and boundaries") {
    val rows = Seq(
      ("MARTHA", "MARHTA", 0.961111),
      ("DIXON", "DICKSONX", 0.813333),
      ("JELLYFISH", "SMELLYFISH", 0.896296),
      // boost_threshold: jaro <= 0.7 gets NO Winkler boost even with a
      // common prefix (DuckDB/rapidfuzz agreement, verified 0.5 / 0.6)
      ("abcdefgh", "abxxxxxx", 0.5),
      ("abfoo", "abbar", 0.6),
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("", "", 1.0),
      ("a", "", 0.0))
    val got = rows.toDF("a", "b", "want")
      .select(sqlRound(jaro_winkler(col("a"), col("b")), 6).as("jw"),
        col("want"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) === r.getDouble(1),
      s"row $r"))
    // null propagates
    val n = Seq((null.asInstanceOf[String], "x")).toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("upper bound dominates the exact measure on random pairs") {
    import graft.functions.expressions.StringSimilarity.jaro_winkler_upper_bound
    val rnd = new scala.util.Random(5)
    def randStr(): String =
      (0 until rnd.nextInt(30)).map(_ => ('a' + rnd.nextInt(6)).toChar)
        .mkString
    val pairs = (0 until 300).map(_ => (randStr(), randStr())) ++
      Seq(("", ""), ("a", ""), ("abc", "abc"), ("MARTHA", "MARHTA"))
    val rows = pairs.toDF("a", "b")
      .select(jaro_winkler(col("a"), col("b")).as("jw"),
        jaro_winkler_upper_bound(col("a"), col("b")).as("ub"))
      .collect()
    rows.foreach(r =>
      assert(r.getDouble(1) >= r.getDouble(0) - 1e-12,
        s"bound ${r.getDouble(1)} < exact ${r.getDouble(0)}"))
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(100)
      .selectExpr("concat('doc', id) as a", "concat('dog', id) as b")
      .select(jaro_winkler(col("a"), col("b")).as("jw"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val finalSection = plan.split("== Initial Plan ==")(0)
    assert(finalSection.contains("*("), s"not codegen'd:\n$plan")
  }
}

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
