package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Barrier.BarrierOps
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (`Array[Float]`) — the
  * training-data-pipeline ANN surface (BASELINE.json north star).
  *
  * Baseline: brute-force cosine top-k (broadcast the query set, scan the
  * corpus once — linear, embarrassingly parallel). Scale path: LSH
  * random-hyperplane bucketing (candidates shrink by 2^planes) and an
  * IVF-style partition via k-means coarse centroids.
  */
/** Row shape of [[Similarity.hyperplaneBuckets]] — top-level because
  * nested case classes defeat the codegen'd encoder (Janino cannot
  * resolve an inner class constructor and the stage silently falls back
  * to interpreted serialization). */
case class HyperplaneBucket(id: Long, t: Int, b: Long)

object Similarity {

  /** Dot product of two numeric-array columns — the native codegen'd
    * Catalyst expression (graft.functions.expressions.DotProduct): a
    * tight primitive loop, identical double accumulation order to a
    * sequential fold, no per-element lambda frames. */
  def dot(a: Column, b: Column): Column =
    graft.functions.expressions.VectorExpressions.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (double accumulation regardless of input
    * element type). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

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

  /** The deterministic hyperplane matrix as (table, plane, vector)
    * rows — exported so oracle generators can embed the planes as SQL
    * literals and replay signatures/buckets exactly (planeValue has no
    * RNG state). */
  def lshPlaneRows(dim: Int, planes: Int,
      tables: Int): Seq[(Int, Int, Array[Double])] =
    for { t <- 0 until tables; p <- 0 until planes }
      yield (t, p, Array.tabulate(dim)(d => planeValue(t * 1000 + p, d)))

  /** Random-hyperplane LSH signature for one hash table: one bit per
    * plane = sign of the projection (P[same bit] = 1 - angle/π).
    * `table` seeds an independent set of planes. */
  def lshSignature(vecCol: Column, dim: Int, planes: Int,
      table: Int): Column = {
    val v = vecCol.cast(ArrayType(DoubleType))
    val bits = (0 until planes).map { p =>
      val plane = typedLit((0 until dim).map(d =>
        planeValue(table * 1000 + p, d)))
      when(dot(v, plane) >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN top-k with L independent hash tables: a pair is a
    * candidate when it collides in ANY table
    * (P[candidate] = 1-(1-(1-θ/π)^planes)^tables). The bucket join keeps
    * the candidate set ~tables·n·bucketSize — the scale path when
    * broadcast brute-force stops fitting. */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int, planes: Int = 8, tables: Int = 8): DataFrame = {
    // persisted AND materialized eagerly: read once to bucket ids, twice
    // more to re-attach vectors to the deduplicated candidate id pairs —
    // an unmaterialized cached plan scanned several times within one job
    // races its own cache fill and recomputes per scan
    val base = df.select(col(idCol).cast(LongType).as("id"),
        col(vecCol).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    base.count()
    // bucket IDS ONLY (via the per-partition signature kernel): the band
    // self-join and the duplicate-collision dedup shuffle 3 longs per
    // row instead of two full vectors (a colliding pair appears up to
    // `tables` times — carrying the vectors through that shuffle
    // multiplies the dominant exchange by the vector width)
    val bucketed = hyperplaneBuckets(base, "id", "v", dim, planes, tables)
    val q = bucketed.select(col("id").as("query_id"), col("t"), col("b"))
    val c = bucketed.select(col("id").as("corpus_id"), col("t"), col("b"))
    val candidates = q.join(c, Seq("t", "b"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"))
      .distinct()
    val scored = candidates
      .join(base.select(col("id").as("query_id"), col("v").as("qv")),
        Seq("query_id"))
      .join(base.select(col("id").as("corpus_id"), col("v").as("cv")),
        Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos"))
  }

  /** IVF-style ANN top-k: a k-means coarse quantizer partitions the
    * corpus into `nlist` cells; each query probes its `nprobe` nearest
    * centroids and reranks only those cells' vectors by exact cosine.
    * The classic FAISS-IVF scheme on Spark primitives: centroids are
    * tiny and broadcast; the corpus is scanned once to assign cells;
    * the probe join is an equi-join on cell id. Better-behaved than
    * hyperplane LSH when neighbor similarity is weak.
    */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42,
      maxIter: Int = 10): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("v"))
    val centroids = fitIvfCentroids(base, "v", nlist, seed, maxIter)
    ivfTopKWithCentroids(df, idCol, vecCol, k, centroids, nprobe)
  }

  /** Fit the IVF coarse quantizer (k-means centroids) on a BOUNDED
    * sample of the corpus: a coarse quantizer's cell quality barely
    * moves past ~10k points per cell, while `KMeans.fit` over the full
    * corpus scans everything once per init round + Lloyd iteration — at
    * 100 TB that is the difference between a bounded driver-side-ish fit
    * and dozens of full-corpus passes. `fitSampleRows` bounds the
    * expected sample size; the quantizer is deterministic given (seed,
    * corpus). Returns the centroids so callers can CACHE the fitted
    * quantizer across queries on the same corpus. */
  def fitIvfCentroids(df: DataFrame, vecCol: String, nlist: Int,
      seed: Long = 42, maxIter: Int = 10,
      fitSampleRows: Long = 100000): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // persist + materialize the assembled vectors across the k-means||
    // init rounds and Lloyd iterations (ml.KMeans re-evaluates its input
    // per job)
    val vecs = df
      .select(col(vecCol).cast(ArrayType(DoubleType)).as("v"))
      .withColumn("fv", array_to_vector(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = vecs.count()
    val sampled = if (n > fitSampleRows)
      vecs.sample(withReplacement = false, fitSampleRows.toDouble / n, seed)
    else vecs
    val km = new KMeans().setK(nlist).setSeed(seed).setFeaturesCol("fv")
      .setMaxIter(maxIter)
    val model = km.fit(sampled)
    vecs.unpersist()
    model.clusterCenters.map(_.toArray)
  }

  /** IVF probe/rerank against an already-fitted coarse quantizer —
    * the serving path when the quantizer is cached per corpus. */
  def ivfTopKWithCentroids(df: DataFrame, idCol: String, vecCol: String,
      k: Int, centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    val nlist = centroids.length
    val base = df.select(col(idCol).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("v"))

    // distance of a vector column to each centroid (squared L2)
    def dist2(c: Array[Double]): Column = {
      val cc = typedLit(c.toSeq)
      aggregate(zip_with(col("v"), cc, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    }
    val distArr = array(centroids.map(dist2): _*)

    // corpus side: home cell = argmin distance
    val cells = base.withColumn("cell",
      array_position(distArr, array_min(distArr)).cast("int") - 1)
    // query side: nprobe nearest cells
    val probes = base.withColumn("dists", distArr)
      .withColumn("cell", explode(slice(array_sort(
        transform(sequence(lit(0), lit(nlist - 1)),
          i => struct(element_at(col("dists"), i + 1).as("d"),
            i.as("c")))), 1, nprobe)("c")))
      .select(col("id").as("query_id"), col("v").as("qv"), col("cell"))

    val c = cells.select(col("id").as("corpus_id"), col("v").as("cv"),
      col("cell"))
    val scored = probes.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos"))
  }

  /** (planes, tables) sized so a pair sitting EXACTLY at `threshold`
    * is missed with probability ≤ targetMiss; pairs above the threshold
    * miss even less.
    *
    * Planes are sized from the CORPUS size: unrelated high-dimensional
    * vectors are near-orthogonal (per-plane agreement ≈ 1/2), so one
    * table yields ~n²/2^planes random candidate pairs — planes ≈
    * log₂(n/4) keeps that linear in n. Tables then follow from the miss
    * budget at the threshold angle θ (per-plane agreement 1-θ/π):
    * (1 - (1-θ/π)^planes)^tables ≤ targetMiss. Fixed parameters only
    * bound the miss rate for the angle they were sized for — e.g. 8/8
    * is ~1e-15 at cosine 0.9999 but ~6% at 0.9.
    *
    * COST CAVEAT: the guarantee is honest, and at MODERATE thresholds
    * (≲ 0.97, θ ≳ 14°) on large corpora it is genuinely expensive —
    * p₁ shrinks as planes track log₂ n, so tables balloon (e.g. 64
    * tables at threshold 0.95, n = 10⁶), multiplying the bucket-join
    * shuffle. That is the real LSH trade-off, not an implementation
    * artifact; lowering planes instead explodes random candidates
    * (~n²/2^planes per table). Large-corpus callers who know their true
    * pair angles should pass EXPLICIT (planes, tables) sized for those
    * angles (near-identical dups at cos ≈ 0.9999 need only e.g. 20/8:
    * miss ~4e-11 with 2⁻²⁰ bucket sparsity), or use IVF. */
  def lshParamsFor(threshold: Double, n: Long,
      targetMiss: Double = 1e-6): (Int, Int) = {
    val t = math.max(-0.999, math.min(0.999, threshold))
    val pCol = 1.0 - math.acos(t) / math.Pi
    val planes = math.max(4, math.min(20,
      math.ceil(math.log(math.max(16.0, n.toDouble / 4)) / math.log(2.0)).toInt))
    val p1 = math.pow(pCol, planes.toDouble)
    val tables = math.max(2, math.min(64,
      math.ceil(math.log(targetMiss) / math.log1p(-p1)).toInt))
    (planes, tables)
  }

  /** (id, table, bucket) hyperplane-LSH signatures computed in ONE
    * per-partition kernel over a precomputed plane matrix — tight JVM
    * loops, no per-plane expression nodes. The Column-expression
    * [[lshSignature]] is fine for small (planes × tables); past a few
    * hundred plane dots the generated code blows Janino's 64 KB method
    * limit and the whole stage silently falls back to interpreted
    * execution — the kernel is the scale path (same planeValue stream,
    * so both agree bit-for-bit). No shuffle; linear in n · tables. */
  def hyperplaneBuckets(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, planes: Int, tables: Int): DataFrame = {
    val mat: Array[Array[Double]] = Array.tabulate(tables * planes) { i =>
      val t = i / planes; val p = i % planes
      Array.tabulate(dim)(d => planeValue(t * 1000 + p, d))
    }
    val base = df.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("v"))
    implicit val enc = Encoders.product[HyperplaneBucket]
    base.mapPartitions { rows: Iterator[Row] =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val vs = r.getSeq[Double](1)
        val v = new Array[Double](math.min(vs.length, dim))
        var i = 0
        while (i < v.length) { v(i) = vs(i); i += 1 }
        (0 until tables).iterator.map { t =>
          var b = 0L
          var p = 0
          while (p < planes) {
            val plane = mat(t * planes + p)
            var s = 0.0
            var d = 0
            while (d < v.length) { s += v(d) * plane(d); d += 1 }
            if (s >= 0) b |= 1L << p
            p += 1
          }
          HyperplaneBucket(id, t, b)
        }
      }
    }.toDF()
  }

  /** Exact embedding near-duplicate pairs — the O(n²) brute-force path,
    * selectable for small corpora or thresholds too low for LSH recall
    * to be economical. Broadcasts one side; never use beyond ~10⁵ rows.
    */
  def cosineNearDupPairsExact(df: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    val a = broadcast(df.select(col(idCol).as("i"), col(vecCol).as("va")))
    val b = df.select(col(idCol).as("j"), col(vecCol).as("vb"))
    a.join(b, col("i") < col("j"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), col("cos"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, i < j.
    *
    * Candidates come from banded hyperplane-LSH buckets (a pair is a
    * candidate when its bit signatures collide in ANY of `tables`
    * tables), then every candidate is verified with EXACT cosine — so
    * the output contains no false positives. With the default
    * `planes = 0, tables = 0` both are derived from the threshold via
    * [[lshParamsFor]], guaranteeing miss probability ≤ 1e-6 for pairs AT
    * the threshold (fixed parameters only bound the miss rate for the
    * angle they were sized for — e.g. 8/8 is ~1e-15 at cosine 0.9999 but
    * ~6% at 0.9). Explicit values are honored as given. For small
    * corpora or low thresholds [[cosineNearDupPairsExact]] stays
    * selectable. The plan is linear: one signature scan, one id-only
    * bucket self-join, one candidate-sized verify join — never the
    * O(n²) all-pairs BroadcastNestedLoopJoin a naive `i < j` theta join
    * plans. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dim: Int, planes: Int = 0,
      tables: Int = 0): DataFrame = {
    // persisted AND materialized eagerly (scanned 3×: bucketing + two
    // vector join-backs — see lshTopK); the count doubles as the corpus
    // size for auto parameter sizing
    val base = df.select(col(idCol).cast(LongType).as("id"),
        col(vecCol).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = base.count()
    val (autoP, autoT) = lshParamsFor(threshold, n)
    val nPlanes = if (planes > 0) planes else autoP
    val nTables = if (tables > 0) tables else autoT
    // signatures via the per-partition kernel: auto-sized params can
    // reach hundreds of plane dots, past what one codegen'd expression
    // tree survives
    val bucketed = hyperplaneBuckets(base, "id", "v", dim, nPlanes, nTables)
    val a = bucketed.select(col("id").as("i"), col("t"), col("b"))
    val b = bucketed.select(col("id").as("j"), col("t"), col("b"))
    val candidates = a.join(b, Seq("t", "b"))
      .filter(col("i") < col("j"))
      .select(col("i"), col("j"))
      .distinct()
    val out = candidates
      .join(base.select(col("id").as("i"), col("v").as("va")), Seq("i"))
      .join(base.select(col("id").as("j"), col("v").as("vb")), Seq("j"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("i"), col("j"), col("cos"))
      // eager: the pair output is small; materializing it here lets the
      // scoped persist of `base` be released before returning
      .barrier()
    base.unpersist(false)
    out
  }
}
