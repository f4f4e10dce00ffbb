package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`Array[Float]`) — the
  * training-data-pipeline ANN surface (BASELINE.json north star).
  *
  * Baseline: brute-force cosine top-k (broadcast the query set, scan the
  * corpus once — linear, embarrassingly parallel). Scale path: LSH
  * random-hyperplane bucketing (candidates shrink by 2^planes) and an
  * IVF-style partition via k-means coarse centroids.
  */
object Similarity {

  /** Dot product of two double-array columns (sequential left-to-right
    * fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; inputs cast to double for stable math. */
  def cosine(a: Column, b: Column): Column = {
    val ad = a.cast(ArrayType(DoubleType))
    val bd = b.cast(ArrayType(DoubleType))
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * corpus vectors (excluding itself). The query side is broadcast —
    * corpus scans once, no shuffle until the per-query top-k. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val scored = q.join(c, col("query_id") =!= col("corpus_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dimension d →
    * a fixed hash-derived value in [-1, 1). No RNG state, so executors
    * and repeated runs agree. */
  private def planeValue(p: Int, d: Int): Double = {
    var h = p.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xC2B2AE3D27D4EB4FL
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
    (h.toDouble / Long.MaxValue.toDouble)
  }

  /** Random-hyperplane LSH signature: one bit per plane = sign of the
    * projection. Vectors in the same bucket are likely neighbors
    * (P[same bit] = 1 - angle/π). */
  def lshSignature(vecCol: Column, dim: Int, planes: Int = 12): Column = {
    val v = vecCol.cast(ArrayType(DoubleType))
    val bits = (0 until planes).map { p =>
      val plane = typedLit((0 until dim).map(d => planeValue(p, d)))
      when(dot(v, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN top-k: candidates restricted to the query's bucket
    * (plus optionally hamming-1 probe buckets). Trades recall for a
    * 2^planes candidate reduction — the scale path when broadcast
    * brute-force stops fitting. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, planes: Int = 8, multiProbe: Boolean = true): DataFrame = {
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshSignature(col(vecCol), dim, planes).as("bucket"))
    // multi-probe: each vector also visits all hamming-1 buckets on the
    // query side, recovering most cross-boundary neighbors
    val probes = if (multiProbe) {
      val flips = typedLit((0 until planes).map(p => 1L << p) :+ 0L)
      sig.withColumn("probe", explode(transform(flips,
        f => col("bucket").bitwiseXOR(f))))
    } else sig.withColumn("probe", col("bucket"))
    val q = probes.select(col("id").as("query_id"), col("v").as("qv"),
      col("probe"))
    val c = sig.select(col("id").as("corpus_id"), col("v").as("cv"),
      col("bucket").as("probe"))
    val scored = q.join(c, Seq("probe"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qv"), col("cv")).as("cos"))
      .groupBy(col("query_id"), col("corpus_id")).agg(max(col("cos")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, i < j.
    * Brute force over the pair space with the self-join pruned by id
    * order; swap in lshTopK buckets at scale. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("i"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("j"), col(vecCol).as("vb"))
    a.join(b, col("i") < col("j"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), col("cos"))
  }
}
