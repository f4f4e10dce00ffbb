package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fitted product quantizer: `codebooks(s)(c)` is the `subDim`-length
  * centroid `c` of subspace `s`. Codes are `m = codebooks.length`
  * small ints per vector — at 100 TB the difference between shuffling
  * 16 bytes and 256+ bytes per vector. Top-level case classes: nested
  * ones defeat the codegen'd encoder. */
case class PqModel(subDim: Int, codebooks: Array[Array[Array[Double]]]) {
  def m: Int = codebooks.length
  def dim: Int = m * subDim
  def kCodes: Int = codebooks.head.length
}

/** Row shape of [[ProductQuantization.pqEncode]]. */
case class PqCode(id: Long, code: Array[Short])

/** Row shape of [[ProductQuantization.pqEncodeWithCells]]. */
case class PqCellCode(id: Long, cell: Int, code: Array[Short])

/** Row shape of [[ProductQuantization.pqTopK]]'s partition-local hits. */
case class PqHit(query_id: Long, corpus_id: Long, adist: Double)

/** Product quantization for embedding columns (FAISS-PQ shape on Spark
  * primitives — the scale path when raw vectors no longer fit the
  * shuffle):
  *
  *  - [[fitPq]]: per-subspace k-means codebooks, fitted DRIVER-SIDE on
  *    a bounded sample (deterministic Lloyd; a quantizer's quality
  *    saturates far below the corpus size, so a 10k sample replaces
  *    m × full-corpus KMeans jobs);
  *  - [[pqEncode]]: one per-partition kernel pass compressing each
  *    vector to m code bytes — linear scan, no shuffle;
  *  - [[pqTopK]]: ADC (asymmetric distance computation) — per-query
  *    lookup tables of exact query-subvector→centroid distances are
  *    broadcast, the code table is scanned once with partition-local
  *    top-k heaps, and only nq·k rows per partition reach the final
  *    global top-k. The corpus side never materializes a float vector.
  */
object ProductQuantization {

  /** Deterministic per-subspace Lloyd k-means over a bounded sample.
    * Init takes evenly-spaced distinct sample points (stable across
    * runs/executors — no RNG state). */
  def fitPq(df: DataFrame, vecCol: String, m: Int = 16, kCodes: Int = 16,
      iters: Int = 10, fitSampleRows: Int = 10000): PqModel = {
    val sample: Array[Array[Double]] = df
      .select(col(vecCol).cast(ArrayType(DoubleType)).as("v"))
      .limit(fitSampleRows)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty sample for PQ fit")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val subDim = dim / m

    def lloyd(points: Array[Array[Double]]): Array[Array[Double]] = {
      val n = points.length
      val k = math.min(kCodes, n)
      // evenly-spaced init over the sample order
      var centroids = Array.tabulate(k)(i =>
        points(((i.toLong * n) / k).toInt).clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k, subDim)(0.0)
        val counts = new Array[Long](k)
        var p = 0
        while (p < n) {
          val pt = points(p)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var d = 0.0; var j = 0
            val cc = centroids(c)
            while (j < subDim) {
              val diff = pt(j) - cc(j); d += diff * diff; j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var j = 0
          while (j < subDim) { sums(best)(j) += pt(j); j += 1 }
          counts(best) += 1
          p += 1
        }
        centroids = Array.tabulate(k) { c =>
          if (counts(c) == 0) centroids(c)
          else Array.tabulate(subDim)(j => sums(c)(j) / counts(c))
        }
        it += 1
      }
      centroids
    }

    val codebooks = Array.tabulate(m) { s =>
      lloyd(sample.map(_.slice(s * subDim, (s + 1) * subDim)))
    }
    PqModel(subDim, codebooks)
  }

  /** Compress vectors to m nearest-centroid codes — one kernel pass,
    * no shuffle. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame = {
    val base = df.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("v"))
    val bc = base.sparkSession.sparkContext.broadcast(model)
    implicit val enc = Encoders.product[PqCode]
    base.mapPartitions { rows: Iterator[Row] =>
      val mdl = bc.value
      val subDim = mdl.subDim
      rows.map { r =>
        val vs = r.getSeq[Double](1)
        val code = new Array[Short](mdl.m)
        var s = 0
        while (s < mdl.m) {
          val book = mdl.codebooks(s)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < book.length) {
            val cc = book(c)
            var d = 0.0; var j = 0
            while (j < subDim) {
              val diff = vs(s * subDim + j) - cc(j); d += diff * diff
              j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          code(s) = best.toShort
          s += 1
        }
        PqCode(r.getLong(0), code)
      }
    }.toDF()
  }

  /** One kernel pass emitting (id, home IVF cell, PQ code) — the full
    * FAISS-IVFPQ index build as a linear scan: coarse cell = nearest
    * centroid over the full vector, code = per-subspace nearest
    * codebook entries. No shuffle. */
  def pqEncodeWithCells(df: DataFrame, idCol: String, vecCol: String,
      model: PqModel, centroids: Array[Array[Double]]): DataFrame = {
    val base = df.select(col(idCol).cast(LongType).as("id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("v"))
    val bcM = base.sparkSession.sparkContext.broadcast(model)
    val bcC = base.sparkSession.sparkContext.broadcast(centroids)
    implicit val enc = Encoders.product[PqCellCode]
    base.mapPartitions { rows: Iterator[Row] =>
      val mdl = bcM.value; val cents = bcC.value
      val subDim = mdl.subDim
      rows.map { r =>
        val vs = r.getSeq[Double](1)
        var cell = 0; var cellD = Double.MaxValue
        var ci = 0
        while (ci < cents.length) {
          val cc = cents(ci)
          var d = 0.0; var j = 0
          while (j < cc.length && j < vs.length) {
            val diff = vs(j) - cc(j); d += diff * diff; j += 1
          }
          if (d < cellD) { cellD = d; cell = ci }
          ci += 1
        }
        val code = new Array[Short](mdl.m)
        var s = 0
        while (s < mdl.m) {
          val book = mdl.codebooks(s)
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < book.length) {
            val bc = book(c)
            var d = 0.0; var j = 0
            while (j < subDim) {
              val diff = vs(s * subDim + j) - bc(j); d += diff * diff
              j += 1
            }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          code(s) = best.toShort
          s += 1
        }
        PqCellCode(r.getLong(0), cell, code)
      }
    }.toDF()
  }

  /** IVF+PQ top-k (the full FAISS-IVFPQ serving shape): each query
    * probes its `nprobe` nearest coarse cells, and ADC runs ONLY over
    * codes homed in a probed cell — the scan does `nprobe/nlist` of the
    * work per query and the corpus side still never ships a float
    * vector. Same bounded-query broadcast contract as [[pqTopK]]. */
  def ivfPqTopK(cellCodes: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: PqModel, centroids: Array[Array[Double]],
      k: Int, nprobe: Int): DataFrame = {
    val spark = cellCodes.sparkSession
    val qs: Array[(Long, Array[Double])] = queries
      .select(col(idCol).cast(LongType), col(vecCol).cast(ArrayType(DoubleType)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val luts: Array[(Long, Array[Array[Double]])] = qs.map { case (qid, qv) =>
      qid -> Array.tabulate(model.m) { s =>
        model.codebooks(s).map { cc =>
          var d = 0.0; var j = 0
          while (j < model.subDim) {
            val diff = qv(s * model.subDim + j) - cc(j); d += diff * diff
            j += 1
          }
          d
        }
      }
    }
    // per-cell list of query indices probing it (driver-side: nq × nlist)
    val probes: Array[Array[Int]] = {
      val byCell = Array.fill(centroids.length)(
        scala.collection.mutable.ArrayBuffer.empty[Int])
      qs.zipWithIndex.foreach { case ((_, qv), qi) =>
        val dists = centroids.map { cc =>
          var d = 0.0; var j = 0
          while (j < cc.length && j < qv.length) {
            val diff = qv(j) - cc(j); d += diff * diff; j += 1
          }
          d
        }
        dists.zipWithIndex.sortBy(_._1).take(nprobe)
          .foreach { case (_, ci) => byCell(ci) += qi }
      }
      byCell.map(_.toArray)
    }
    val bcLuts = spark.sparkContext.broadcast(luts)
    val bcProbes = spark.sparkContext.broadcast(probes)
    implicit val enc = Encoders.product[PqHit]
    val idIdx = cellCodes.schema.fieldIndex("id")
    val cellIdx = cellCodes.schema.fieldIndex("cell")
    val codeIdx = cellCodes.schema.fieldIndex("code")
    val localHits = cellCodes.mapPartitions { rows: Iterator[Row] =>
      val ls = bcLuts.value; val prb = bcProbes.value
      // lexicographic (dist, id) heap: ADC distances tie easily
      // (identical codes ⇒ identical distance), and the final window
      // breaks ties on corpus_id asc — eviction must agree or results
      // depend on partition scan order.
      val heaps = ls.map { case (qid, _) =>
        qid -> scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
          Ordering.by(t => (t._1, t._2)))
      }
      rows.foreach { r =>
        val id = r.getLong(idIdx)
        val cell = r.getInt(cellIdx)
        val qis = prb(cell)
        if (qis.nonEmpty) {
          val code = r.getSeq[Short](codeIdx)
          var x = 0
          while (x < qis.length) {
            val qi = qis(x)
            val (qid, lut) = ls(qi)
            if (qid != id) {
              var d = 0.0; var s = 0
              while (s < lut.length) { d += lut(s)(code(s)); s += 1 }
              val heap = heaps(qi)._2
              if (heap.size < k) heap.enqueue((d, id))
              else if (d < heap.head._1 ||
                  (d == heap.head._1 && id < heap.head._2)) {
                heap.dequeue(); heap.enqueue((d, id))
              }
            }
            x += 1
          }
        }
      }
      heaps.iterator.flatMap { case (qid, heap) =>
        heap.iterator.map { case (d, id) => PqHit(qid, id, d) }
      }
    }.toDF()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("corpus_id").asc)
    localHits.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("adist"))
  }

  /** Two-stage serving: ADC SHORTLIST of k·expand candidates per query,
    * then exact squared-L2 re-rank of the shortlist against the TRUE
    * vectors — the FAISS refine stage. The exact computation touches
    * only nq·k·expand (query, corpus) pairs, so full float vectors are
    * joined back for the shortlist alone, never scanned corpus-wide;
    * raising `expand` trades that bounded join volume for recall.
    * Output: (query_id, rank, corpus_id, dist), rank 1 = nearest by
    * exact distance. */
  def pqTopKRefined(codes: DataFrame, corpus: DataFrame,
      queries: DataFrame, idCol: String, vecCol: String, model: PqModel,
      k: Int, expand: Int = 4): DataFrame = {
    val shortlist = pqTopK(codes, queries, idCol, vecCol, model, k * expand)
      .select(col("query_id"), col("corpus_id"))
    val corp = corpus.select(col(idCol).cast(LongType).as("corpus_id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("__cv"))
    val qs = broadcast(queries.select(
      col(idCol).cast(LongType).as("query_id"),
      col(vecCol).cast(ArrayType(DoubleType)).as("__qv")))
    val sqDist = aggregate(
      zip_with(col("__qv"), col("__cv"), (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("corpus_id").asc)
    shortlist
      .join(corp, "corpus_id")
      .join(qs, "query_id")
      .withColumn("dist", sqDist)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("dist"))
  }

  /** ADC top-k: approximate squared-L2 distance of each query to every
    * coded corpus vector via table lookups (exact query-subvector →
    * centroid distances, summed over the m code entries). Queries are
    * a bounded set (same broadcast contract as bruteForceTopK); output
    * (query_id, rank, corpus_id, adist), rank 1 = nearest. */
  def pqTopK(codes: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, model: PqModel, k: Int): DataFrame = {
    val spark = codes.sparkSession
    val qs: Array[(Long, Array[Double])] = queries
      .select(col(idCol).cast(LongType), col(vecCol).cast(ArrayType(DoubleType)))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // per-query LUT: luts(q)(s)(c) = ||query_sub(s) - centroid(s)(c)||²
    val luts: Array[(Long, Array[Array[Double]])] = qs.map { case (qid, qv) =>
      qid -> Array.tabulate(model.m) { s =>
        model.codebooks(s).map { cc =>
          var d = 0.0; var j = 0
          while (j < model.subDim) {
            val diff = qv(s * model.subDim + j) - cc(j); d += diff * diff
            j += 1
          }
          d
        }
      }
    }
    val bc = spark.sparkContext.broadcast(luts)
    implicit val enc = Encoders.product[PqHit]
    val codeIdx = codes.schema.fieldIndex("code")
    val idIdx = codes.schema.fieldIndex("id")
    // partition-local top-k heaps: only nq·k rows per partition survive
    val localHits = codes.mapPartitions { rows: Iterator[Row] =>
      val ls = bc.value
      // max-heap on (distance, id): root = worst kept. Tie-aware so a
      // tied candidate with smaller corpus_id always survives — matches
      // the final window's (adist asc, corpus_id asc) order.
      val heaps = ls.map { case (qid, _) =>
        qid -> scala.collection.mutable.PriorityQueue.empty[(Double, Long)](
          Ordering.by(t => (t._1, t._2)))
      }
      rows.foreach { r =>
        val id = r.getLong(idIdx)
        val code = r.getSeq[Short](codeIdx)
        var qi = 0
        while (qi < ls.length) {
          val (qid, lut) = ls(qi)
          if (qid != id) {
            var d = 0.0; var s = 0
            while (s < lut.length) { d += lut(s)(code(s)); s += 1 }
            val heap = heaps(qi)._2
            if (heap.size < k) heap.enqueue((d, id))
            else if (d < heap.head._1 ||
                (d == heap.head._1 && id < heap.head._2)) {
              heap.dequeue(); heap.enqueue((d, id))
            }
          }
          qi += 1
        }
      }
      heaps.iterator.flatMap { case (qid, heap) =>
        heap.iterator.map { case (d, id) => PqHit(qid, id, d) }
      }
    }.toDF()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("corpus_id").asc)
    localHits.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("adist"))
  }
}
