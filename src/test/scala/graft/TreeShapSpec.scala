package graft

import scala.util.Random

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.tree.{GraftTreeAccess, InternalNode, LeafNode, Node}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ml.TreeShap

/** Exact TreeSHAP validated against brute-force Shapley values
  * (exhaustive subset enumeration — tractable for ≤ 6 features). */
class TreeShapSpec extends SparkSpec {

  /** E[f(x) | features in S fixed to x's values] by cover-weighted
    * descent — the conditional expectation TreeSHAP attributes. */
  private def condExp(node: Node, x: Vector, s: Set[Int]): Double =
    node match {
      case l: LeafNode =>
        val st = GraftTreeAccess.nodeStats(l)
        if (st.sum == 0) 0.0 else st(1) / st.sum
      case in: InternalNode =>
        if (s.contains(GraftTreeAccess.splitFeature(in))) {
          val next = if (GraftTreeAccess.goLeft(in, x)) in.leftChild
            else in.rightChild
          condExp(next, x, s)
        } else {
          def cover(n: Node) = GraftTreeAccess.nodeStats(n).sum
          val c = cover(in)
          (cover(in.leftChild) * condExp(in.leftChild, x, s)
            + cover(in.rightChild) * condExp(in.rightChild, x, s)) / c
        }
    }

  private def bruteForceShap(root: Node, x: Vector,
      nFeatures: Int): Array[Double] = {
    def fact(n: Int): Double = (1 to n).product.toDouble
    val all = (0 until nFeatures).toSet
    (0 until nFeatures).map { i =>
      val others = (all - i).toSeq
      (0 to others.length).flatMap(k => others.combinations(k))
        .map(_.toSet)
        .distinct
        .map { s =>
          val weight = fact(s.size) * fact(nFeatures - s.size - 1) /
            fact(nFeatures)
          weight * (condExp(root, x, s + i) - condExp(root, x, s))
        }.sum
    }.toArray
  }

  /** Features repeated along a root→leaf path make path-dependent
    * TreeSHAP deviate from brute-force Shapley of the cover-conditional
    * expectation (a documented property of the algorithm — which is
    * exactly what shap.TreeExplainer computes, our parity target). The
    * brute-force equality check therefore runs on a tree with no
    * repeated features per path. */
  private def hasRepeatedFeatureOnPath(node: Node,
      seen: Set[Int] = Set.empty): Boolean = node match {
    case _: LeafNode => false
    case in: InternalNode =>
      val f = GraftTreeAccess.splitFeature(in)
      seen.contains(f) ||
        hasRepeatedFeatureOnPath(in.leftChild, seen + f) ||
        hasRepeatedFeatureOnPath(in.rightChild, seen + f)
  }

  test("TreeSHAP matches brute-force Shapley on a fitted tree") {
    val rng = new Random(3)
    val rows = (0 until 600).map { _ =>
      val f = Array.fill(4)(rng.nextDouble() * 10)
      val label = if (f(0) + 2 * f(1) - f(2) > 12) 1 else 0
      Row(Vectors.dense(f), label)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows),
      StructType(Seq(
        StructField("features", org.apache.spark.ml.linalg.SQLDataTypes.VectorType),
        StructField("label", IntegerType))))
    val tree = new org.apache.spark.ml.classification.DecisionTreeClassifier()
      .setMaxDepth(2).setSeed(11).setLabelCol("label").fit(df)
    val root = GraftTreeAccess.rootOf(tree)
    assert(!hasRepeatedFeatureOnPath(root),
      "fixture tree must not repeat features on a path")

    for (trial <- 0 until 10) {
      val x = Vectors.dense(Array.fill(4)(rng.nextDouble() * 10))
      val fast = TreeShap.shapValues(root, x, 4)
      val brute = bruteForceShap(root, x, 4)
      for (i <- 0 until 4) {
        assert(math.abs(fast(i) - brute(i)) < 1e-9,
          s"trial $trial feature $i: ${fast(i)} vs ${brute(i)}")
      }
    }
  }

  test("TreeSHAP local accuracy: bias + sum(phi) = prediction") {
    val rng = new Random(5)
    val rows = (0 until 400).map { _ =>
      val f = Array.fill(3)(rng.nextDouble())
      Row(Vectors.dense(f), if (f(0) > f(1)) 1 else 0)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows),
      StructType(Seq(
        StructField("features", org.apache.spark.ml.linalg.SQLDataTypes.VectorType),
        StructField("label", IntegerType))))
    val rf = new org.apache.spark.ml.classification.RandomForestClassifier()
      .setNumTrees(7).setMaxDepth(4).setSeed(2).setLabelCol("label").fit(df)
    val roots = GraftTreeAccess.rootsOf(rf)

    val scored = rf.transform(df).limit(20)
    val explained = TreeShap.forestShap(roots, 3, scored)
    val rows2 = explained.select(
      (col("expected_value")
        + aggregate(col("shap"), lit(0.0), (a, b) => a + b)).as("recon"),
      org.apache.spark.ml.functions.vector_to_array(col("probability"))(1)
        .as("p1")).collect()
    rows2.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("GBT TreeSHAP local accuracy in margin space") {
    val rng = new Random(9)
    val rows = (0 until 400).map { _ =>
      val f = Array.fill(3)(rng.nextDouble())
      Row(Vectors.dense(f), if (f(0) + f(1) > 1.0) 1 else 0)
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows),
      StructType(Seq(
        StructField("features", org.apache.spark.ml.linalg.SQLDataTypes.VectorType),
        StructField("label", IntegerType))))
    val gbt = new org.apache.spark.ml.classification.GBTClassifier()
      .setMaxIter(5).setMaxDepth(3).setSeed(4).setLabelCol("label").fit(df)
    val roots = GraftTreeAccess.rootsOfGbt(gbt)

    val scored = gbt.transform(df).limit(20)
    val explained = TreeShap.gbtShap(roots, gbt.treeWeights, 3, scored)
    // margin = rawPrediction(1); bias + sum(phi) must reconstruct it
    val rows2 = explained.select(
      (col("expected_value")
        + aggregate(col("shap"), lit(0.0), (a, b) => a + b)).as("recon"),
      org.apache.spark.ml.functions.vector_to_array(col("rawPrediction"))(1)
        .as("margin")).collect()
    rows2.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9,
        s"${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }
}
