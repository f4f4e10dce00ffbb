package org.apache.spark.ml.tree

import org.apache.spark.ml.linalg.Vector

/** Public accessors for Spark ML's package-private tree internals,
  * used by graft.ml.Explain's Saabas path contributions. Lives in
  * org.apache.spark.ml.tree to reach private[ml] members — standard
  * extension-shim technique; contains no Spark code, only forwarding.
  */
object GraftTreeAccess {

  /** The per-node class-count statistics (impurity stats). */
  def nodeStats(node: Node): Array[Double] =
    if (node.impurityStats == null) Array.empty else node.impurityStats.stats

  def goLeft(node: InternalNode, x: Vector): Boolean =
    node.split.shouldGoLeft(x)

  def splitFeature(node: InternalNode): Int = node.split.featureIndex

  /** Root nodes of a fitted ensemble's trees (forest or GBT). */
  def rootsOf(model: org.apache.spark.ml.classification.RandomForestClassificationModel): Array[Node] =
    model.trees.map(_.rootNode)

  def rootsOfGbt(model: org.apache.spark.ml.classification.GBTClassificationModel): Array[Node] =
    model.trees.map(_.rootNode)

  def rootOf(model: org.apache.spark.ml.classification.DecisionTreeClassificationModel): Node =
    model.rootNode

  /** Node prediction (leaf value / internal majority value) — needed for
    * regression trees (GBT members) whose impurity stats are
    * (count, sum, sumSq), not class counts. */
  def prediction(node: Node): Double = node.prediction

  /** Training-sample count at a node, valid for any impurity type. */
  def count(node: Node): Double =
    if (node.impurityStats == null) 0.0 else node.impurityStats.count.toDouble
}
