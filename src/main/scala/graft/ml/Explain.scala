package graft.ml

import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.ml.tree.{GraftTreeAccess, InternalNode, LeafNode, Node}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Model explanation (reference explain.py:13-156, SURVEY.md §7.4.1).
  *
  * The reference ships scores to the driver and runs Python `shap`
  * (LinearExplainer for LR, TreeExplainer for tree models). There is no
  * JVM shap, so:
  *  - Linear models: exact interventional linear SHAP
  *    φ_i = w_i·(x_i − E[x_i]) — computed fully distributed (one
  *    Summarizer pass for the means, then pure column math). The
  *    reference's `correlation_dependent` variant differs when features
  *    are correlated; documented delta.
  *  - Tree ensembles: Saabas path contributions (per-node value deltas
  *    along the decision path) — the classic TreeExplainer
  *    approximation; exact TreeSHAP is future work.
  *
  * Contributions are in margin space (log-odds for LR); `sigmoid`
  * converts to probabilities (reference __main__.py:234-243).
  */
object Explain {

  /** Per-row linear SHAP values for a fitted LogisticRegressionModel:
    * output column `shap` (array, one value per feature) and
    * `expected_value` (the margin at the feature means). */
  def linearShap(model: LogisticRegressionModel, df: DataFrame,
      featuresCol: String = "features"): DataFrame = {
    val means: Vector =
      df.select(Summarizer.mean(col(featuresCol)).as("m"))
        .first().getAs[Vector]("m")
    val w = model.coefficients.toArray
    val expected = model.intercept +
      w.zip(means.toArray).map { case (wi, mi) => wi * mi }.sum
    val x = vector_to_array(col(featuresCol))
    val contribs = array(w.indices.map(i =>
      lit(w(i)) * (x(i) - lit(means(i)))): _*)
    df.withColumn("shap", contribs)
      .withColumn("expected_value", lit(expected))
  }

  /** Saabas contributions for one decision tree: walks the path for a
    * feature vector, attributing each split's change in leaf-value
    * expectation to the split feature. Returns (bias, contributions). */
  private def treePath(root: Node, x: Vector, nFeatures: Int): (Double, Array[Double]) = {
    val contribs = new Array[Double](nFeatures)
    var node: Node = root
    val bias = nodeValue(root)
    while (node.isInstanceOf[InternalNode]) {
      val in = node.asInstanceOf[InternalNode]
      val next =
        if (GraftTreeAccess.goLeft(in, x)) in.leftChild else in.rightChild
      contribs(GraftTreeAccess.splitFeature(in)) += nodeValue(next) - nodeValue(node)
      node = next
    }
    (bias, contribs)
  }

  // For classification trees we use P(class=1) from the node's impurity
  // stats so the contributions telescope into a probability.
  private def nodeValue(node: Node): Double = {
    val stats = GraftTreeAccess.nodeStats(node)
    val total = stats.sum
    if (total == 0 || stats.length < 2) 0.0 else stats(1) / total
  }

  /** Per-row Saabas contributions averaged over a random-forest
    * ensemble. Trees are broadcast; the walk is a deterministic Scala
    * UDF (explanation is not the scan hot path). Output columns `bias`,
    * `contrib` (array per feature). */
  def forestContributions(
      treeRoots: Array[Node],
      nFeatures: Int, df: DataFrame,
      featuresCol: String = "features"): DataFrame = {
    val spark = df.sparkSession
    val roots = spark.sparkContext.broadcast(treeRoots)
    val contribUdf = udf { (v: Vector) =>
      val n = roots.value.length
      val acc = new Array[Double](nFeatures)
      var bias = 0.0
      roots.value.foreach { r =>
        val (b, c) = treePath(r, v, nFeatures)
        bias += b / n
        var i = 0
        while (i < nFeatures) { acc(i) += c(i) / n; i += 1 }
      }
      (bias, acc.toSeq)
    }
    df.withColumn("__bc", contribUdf(col(featuresCol)))
      .withColumn("bias", col("__bc._1"))
      .withColumn("contrib", col("__bc._2"))
      .drop("__bc")
  }

  /** Correlation-dependent linear SHAP (the reference's
    * `LinearExplainer(..., feature_perturbation="correlation_dependent")`,
    * explain.py:64-69): Shapley values of the CONDITIONAL expectation
    * under a multivariate-Gaussian feature model — features correlated
    * with x_i share credit.
    *
    * For linear f(x) = w·x + b and X ~ N(μ, Σ),
    * E[f | x_S] = w·(A_S·x + b_S) with A_S = Σ[:,S]·Σ[S,S]⁻¹·R_S, so each
    * feature's φ is LINEAR in x. We average the per-ordering increments
    * over `nOrderings` sampled permutations (shap's own estimator is
    * this sampling) into one d×d transform T and offset c, computed once
    * on the driver from a ≤ `nTrainSample`-row moment estimate
    * (reference default 5000); per-row explanation is then a distributed
    * matvec: φ(x) = T·x + c. Local accuracy is exact for every sampled
    * ordering (the A_S chain telescopes), so bias + Σφ = w·x + b whenever
    * the sampled Σ is full-rank (needs ≥ d moment rows; a rank-deficient
    * Σ makes Σ·pinv(Σ) a projection, not I, and the chain leaks).
    */
  def correlationDependentLinearShap(model: LogisticRegressionModel,
      df: DataFrame, featuresCol: String = "features",
      nTrainSample: Int = 5000, nOrderings: Int = 128,
      seed: Long = 42L, matvecCodegenMaxDim: Int = 32): DataFrame = {
    import breeze.linalg.{pinv, DenseMatrix => BDM, DenseVector => BDV}

    val w = model.coefficients.toArray
    val d = w.length
    // moment estimates from a bounded sample (reference explain.py:56-61)
    val sample = df.select(col(featuresCol)).limit(nTrainSample)
      .collect().map(_.getAs[Vector](0).toArray)
    val n = sample.length
    val mu = BDV.zeros[Double](d)
    sample.foreach(r => mu += BDV(r))
    mu :/= n.toDouble
    val sigma = BDM.zeros[Double](d, d)
    sample.foreach { r =>
      val c = BDV(r) - mu
      sigma += c * c.t
    }
    sigma :/= math.max(n - 1, 1).toDouble

    def transformFor(s: Seq[Int]): BDM[Double] = {
      // A_S = Σ[:,S] · pinv(Σ[S,S]) · R_S  (d×d, zero outside S-columns)
      val a = BDM.zeros[Double](d, d)
      if (s.isEmpty) return a
      val ss = BDM.tabulate(s.length, s.length)((i, j) => sigma(s(i), s(j)))
      val cs = BDM.tabulate(d, s.length)((i, j) => sigma(i, s(j)))
      val proj = cs * pinv(ss) // d × |S|
      for (j <- s.indices; i <- 0 until d) a(i, s(j)) = proj(i, j)
      a
    }

    val rng = new scala.util.Random(seed)
    val tAcc = BDM.zeros[Double](d, d) // per-feature rows of the transform
    val wVec = BDV(w)
    for (_ <- 0 until nOrderings) {
      val order = rng.shuffle((0 until d).toList)
      var prev = BDM.zeros[Double](d, d)
      val s = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (i <- order) {
        s += i
        val cur = transformFor(s.toSeq)
        // φ_i gains w·(A_{S∪i} − A_S)·x (x-linear part; the constant part
        // follows from b_S = μ − A_S·μ)
        val delta = cur - prev
        tAcc(i, ::) :+= (wVec.t * delta)
        prev = cur
      }
    }
    tAcc :/= nOrderings.toDouble
    // constant parts: c_i = −T_i·μ (from b_S differences telescoping)
    val cVec = -(tAcc * mu)

    val expected = model.intercept + wVec.t * mu
    // φ(x) = T·x + c. Two physical plans for the matvec:
    //  - d ≤ matvecCodegenMaxDim: d² literal terms as Column expressions —
    //    stays inside whole-stage codegen, fastest at the reference's
    //    feature counts;
    //  - wide d: d² literals make Janino-compiled methods blow past the
    //    JIT/codegen limits, so broadcast T (one copy per executor, not
    //    per task) and run a tight primitive loop per row instead.
    val contribs =
      if (d <= matvecCodegenMaxDim) {
        val x = vector_to_array(col(featuresCol))
        array((0 until d).map { i =>
          (0 until d).map(j => lit(tAcc(i, j)) * x(j)).reduce(_ + _) +
            lit(cVec(i))
        }: _*)
      } else {
        val sc = df.sparkSession.sparkContext
        // breeze DenseMatrix.toArray is column-major: (i, j) = t(j*d + i)
        val tB = sc.broadcast(tAcc.toArray)
        val cB = sc.broadcast(cVec.toArray)
        val mv = udf { (v: Vector) =>
          val xa = v.toArray
          val t = tB.value; val cc = cB.value
          val out = cc.clone()
          var j = 0
          while (j < d) {
            val xj = xa(j); val base = j * d
            var i = 0
            while (i < d) { out(i) += t(base + i) * xj; i += 1 }
            j += 1
          }
          out.toSeq
        }
        mv(col(featuresCol))
      }
    df.withColumn("shap", contribs)
      .withColumn("expected_value", lit(expected))
  }

  /** log-odds → probability (reference __main__.py:241-243). */
  def sigmoid(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lit(1.0) / (lit(1.0) + exp(-c))

  /** Roll per-feature contributions up into topic groups (reference
    * explain.py:110-156): `topicGroups` maps group → feature-name
    * prefixes; each group's score is the sum of its features'
    * contributions. Output: one column per group. */
  def topicGroupScores(df: DataFrame, featureNames: Seq[String],
      topicGroups: Map[String, Seq[String]],
      contribCol: String = "shap"): DataFrame = {
    topicGroups.foldLeft(df) { case (d, (group, prefixes)) =>
      val idx = featureNames.zipWithIndex.collect {
        case (f, i) if prefixes.exists(f.startsWith) => i
      }
      val s =
        if (idx.isEmpty) lit(0.0)
        else idx.map(i => col(contribCol)(i)).reduce(_ + _)
      d.withColumn(s"topic_$group", s)
    }
  }

  /** Waterfall rescale (reference micro_macro_link.py:13-44): scale the
    * micro scores so they sum exactly to the macro score. */
  def rescaleMicro(df: DataFrame, macroCol: String,
      microCols: Seq[String]): DataFrame = {
    val total = microCols.map(col).reduce(_ + _)
    microCols.foldLeft(df)((d, c) =>
      d.withColumn(c, col(c) * col(macroCol) / total))
  }
}
