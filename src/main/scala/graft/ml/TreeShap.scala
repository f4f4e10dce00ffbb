package graft.ml

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.tree.{GraftTreeAccess, InternalNode, LeafNode, Node}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact TreeSHAP (Lundberg & Lee's polynomial-time Shapley values for
  * tree ensembles — the algorithm behind the reference's
  * `shap.TreeExplainer`, explain.py:72-76). Implemented from the
  * published algorithm (Lundberg et al., "Consistent Individualized
  * Feature Attribution for Tree Ensembles", arXiv:1802.03888,
  * Algorithm 2): a single root-to-leaf traversal maintains the set of
  * unique features on the path with their one/zero covering fractions
  * and Shapley permutation weights.
  *
  * Node values are P(class = 1) from the impurity stats (classification
  * trees); covers are the per-node training sample counts. φ sums over
  * an ensemble's trees divide by the tree count.
  */
object TreeShap {

  private final class PathElem(
    var featureIndex: Int,
    var zeroFraction: Double,
    var oneFraction: Double,
    var pweight: Double) {
    def copyElem: PathElem =
      new PathElem(featureIndex, zeroFraction, oneFraction, pweight)
  }

  /** Leaf value for classification trees: P(class = 1). */
  val classificationValue: Node => Double = { node =>
    val stats = GraftTreeAccess.nodeStats(node)
    val total = stats.sum
    if (total == 0 || stats.length < 2) 0.0 else stats(1) / total
  }

  /** Leaf value for regression trees (GBT members): the node
    * prediction. */
  val regressionValue: Node => Double = GraftTreeAccess.prediction

  private def cover(node: Node): Double = GraftTreeAccess.count(node)

  /** Expected tree output (cover-weighted mean of leaf values). */
  def expectedValue(root: Node,
      value: Node => Double = classificationValue): Double = root match {
    case l: LeafNode => value(l)
    case in: InternalNode =>
      val c = cover(in)
      if (c == 0) 0.0
      else (cover(in.leftChild) * expectedValue(in.leftChild, value)
        + cover(in.rightChild) * expectedValue(in.rightChild, value)) / c
  }

  /** Exact SHAP values of one tree for one feature vector. */
  def shapValues(root: Node, x: Vector, nFeatures: Int,
      value: Node => Double = classificationValue): Array[Double] = {
    val phi = new Array[Double](nFeatures)

    def extend(p: ArrayBuffer[PathElem], pz: Double, po: Double,
        pi: Int): Unit = {
      val m = p.length
      p += new PathElem(pi, pz, po, if (m == 0) 1.0 else 0.0)
      var i = m - 1
      while (i >= 0) {
        p(i + 1).pweight += po * p(i).pweight * (i + 1).toDouble / (m + 1)
        p(i).pweight = pz * p(i).pweight * (m - i).toDouble / (m + 1)
        i -= 1
      }
    }

    def unwind(p: ArrayBuffer[PathElem], i: Int): Unit = {
      val m = p.length - 1
      val dz = p(i).zeroFraction
      val dOne = p(i).oneFraction
      var n = p(m).pweight
      var j = m - 1
      while (j >= 0) {
        if (dOne != 0) {
          val t = p(j).pweight
          p(j).pweight = n * (m + 1).toDouble / ((j + 1) * dOne)
          n = t - p(j).pweight * dz * (m - j).toDouble / (m + 1)
        } else {
          p(j).pweight = p(j).pweight * (m + 1).toDouble / (dz * (m - j))
        }
        j -= 1
      }
      var k = i
      while (k < m) {
        p(k).featureIndex = p(k + 1).featureIndex
        p(k).zeroFraction = p(k + 1).zeroFraction
        p(k).oneFraction = p(k + 1).oneFraction
        k += 1
      }
      p.remove(m)
    }

    def unwoundPathSum(p: ArrayBuffer[PathElem], i: Int): Double = {
      val m = p.length - 1
      val dz = p(i).zeroFraction
      val dOne = p(i).oneFraction
      var total = 0.0
      var n = p(m).pweight
      var j = m - 1
      while (j >= 0) {
        if (dOne != 0) {
          val t = n * (m + 1).toDouble / ((j + 1) * dOne)
          total += t
          n = p(j).pweight - t * dz * (m - j).toDouble / (m + 1)
        } else {
          total += p(j).pweight * (m + 1).toDouble / (dz * (m - j))
        }
        j -= 1
      }
      total
    }

    def recurse(node: Node, parent: ArrayBuffer[PathElem], pz: Double,
        po: Double, pi: Int): Unit = {
      val p = parent.map(_.copyElem)
      extend(p, pz, po, pi)
      node match {
        case leaf: LeafNode =>
          val v = value(leaf)
          var i = 1
          while (i < p.length) {
            val w = unwoundPathSum(p, i)
            phi(p(i).featureIndex) +=
              w * (p(i).oneFraction - p(i).zeroFraction) * v
            i += 1
          }
        case in: InternalNode =>
          val goesLeft = GraftTreeAccess.goLeft(in, x)
          val (hot, cold) =
            if (goesLeft) (in.leftChild, in.rightChild)
            else (in.rightChild, in.leftChild)
          val c = cover(in)
          val rHot = if (c == 0) 0.0 else cover(hot) / c
          val rCold = if (c == 0) 0.0 else cover(cold) / c
          val f = GraftTreeAccess.splitFeature(in)
          var iz = 1.0
          var io = 1.0
          val k = p.indexWhere(_.featureIndex == f, 1)
          if (k >= 0) {
            iz = p(k).zeroFraction
            io = p(k).oneFraction
            unwind(p, k)
          }
          recurse(hot, p, iz * rHot, io, f)
          recurse(cold, p, iz * rCold, 0.0, f)
      }
    }

    recurse(root, ArrayBuffer.empty[PathElem], 1.0, 1.0, -1)
    phi
  }

  /** Exact TreeSHAP for a GBT classifier, in MARGIN space: the model's
    * raw score is sum_t(weight_t · tree_t(x)), so φ is the
    * weight-weighted sum of per-tree regression SHAP values;
    * `expected_value` is the margin at the background distribution.
    * probability = sigmoid(2·margin) for Spark's GBT logistic loss. */
  def gbtShap(treeRoots: Array[Node], treeWeights: Array[Double],
      nFeatures: Int, df: DataFrame,
      featuresCol: String = "features"): DataFrame = {
    val spark = df.sparkSession
    val roots = spark.sparkContext.broadcast(treeRoots)
    val weights = spark.sparkContext.broadcast(treeWeights)
    val expected = treeRoots.zip(treeWeights).map { case (r, w) =>
      w * expectedValue(r, regressionValue)
    }.sum
    val shapUdf = udf { (v: Vector) =>
      val acc = new Array[Double](nFeatures)
      var t = 0
      while (t < roots.value.length) {
        val phi = shapValues(roots.value(t), v, nFeatures, regressionValue)
        var i = 0
        while (i < nFeatures) {
          acc(i) += weights.value(t) * phi(i); i += 1
        }
        t += 1
      }
      acc.toSeq
    }
    df.withColumn("shap", shapUdf(col(featuresCol)))
      .withColumn("expected_value", lit(expected))
  }

  /** Distributed exact TreeSHAP over an ensemble: trees broadcast, one
    * deterministic UDF pass; output `shap` (array per feature) and
    * `expected_value` (ensemble mean leaf value). Ensemble φ = mean of
    * per-tree φ (matching the forest's probability averaging). */
  def forestShap(treeRoots: Array[Node], nFeatures: Int, df: DataFrame,
      featuresCol: String = "features"): DataFrame = {
    val spark = df.sparkSession
    val roots = spark.sparkContext.broadcast(treeRoots)
    val expected = treeRoots.map(r => expectedValue(r)).sum / treeRoots.length
    val shapUdf = udf { (v: Vector) =>
      val n = roots.value.length
      val acc = new Array[Double](nFeatures)
      roots.value.foreach { r =>
        val phi = shapValues(r, v, nFeatures)
        var i = 0
        while (i < nFeatures) { acc(i) += phi(i) / n; i += 1 }
      }
      acc.toSeq
    }
    df.withColumn("shap", shapUdf(col(featuresCol)))
      .withColumn("expected_value", lit(expected))
  }
}
