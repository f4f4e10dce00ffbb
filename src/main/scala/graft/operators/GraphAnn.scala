package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph-based ANN (the HNSW family): per-shard navigable-small-world
  * graphs with a deterministic two-layer hierarchy, built and served
  * as DataFrames.
  *
  * Shape, and why it scales:
  *
  *  - the corpus is hash-SHARDED (`id % nShards`) and each shard's
  *    graph builds INDEPENDENTLY inside one task (`flatMapGroups`) —
  *    the FAISS shard model: build is embarrassingly parallel, a
  *    shard is sized to executor memory by choosing `nShards`, and
  *    no all-pairs or cross-shard traffic ever happens;
  *  - search broadcasts the (small, serving-batch-sized) query set
  *    into every shard task, beam-searches each shard's graph
  *    sublinearly, and merges the per-shard top-k with one window —
  *    the only shuffle is nShards × nQueries × k candidate rows;
  *  - the index IS a DataFrame (shard, id, vector, base-layer
  *    neighbors, upper-layer flag + neighbors): it persists as plain
  *    parquet (the s12 persisted-index plumbing) and reloads
  *    anywhere.
  *
  * Hierarchy and determinism: HNSW assigns levels by coin-flip; here
  * a node is UPPER iff `id % upperEvery == 0`, so builds are
  * bit-reproducible run-over-run (the property every oracle in this
  * repo leans on). Search descends greedily on the upper graph to an
  * entry point, then beam-searches the base layer with `ef`
  * candidates; all comparisons order by (cosine DESC, id ASC), so
  * ties never depend on hash iteration order. Insertion follows
  * Malkov & Yashunin's algorithm: connect each new node to its M
  * nearest beam results, back-link, and prune any neighbor list past
  * 2M by keeping the closest.
  *
  * Full CRUD lifecycle: [[insert]] links new ids incrementally,
  * [[delete]] tombstones (waypoints stay; shard rebuilds past a
  * tombstone-fraction threshold), [[upsert]] replaces vectors by
  * rebuilding only the touched shards. All three leave untouched
  * shards byte-identical, so a `partitionBy("shard")` parquet layout
  * re-persists only touched partitions under churn.
  */
object GraphAnn {

  /** Sequential ascending-index dot fold — the same order the SQL
    * oracles' list_dot_product uses, so cosines are bit-identical. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  /** Best-first beam search over one adjacency map: the `ef` nearest
    * reachable nodes from `entry`, ordered (cos DESC, id ASC). */
  private def beam(vecs: collection.Map[Long, Array[Double]],
      adj: collection.Map[Long, Array[Long]], entry: Long,
      q: Array[Double], ef: Int): Vector[(Long, Double)] = {
    val visited = collection.mutable.HashSet[Long](entry)
    // candidates: best (highest cos, then smaller id) on top
    val cand = collection.mutable.PriorityQueue[(Double, Long)]()(
      Ordering.by(t => (t._1, -t._2)))
    // results: WORST on top, so exceeding ef pops the worst
    val res = collection.mutable.PriorityQueue[(Double, Long)]()(
      Ordering.by(t => (-t._1, t._2)))
    val c0 = cosine(q, vecs(entry))
    cand.enqueue((c0, entry))
    res.enqueue((c0, entry))
    var done = false
    while (!done && cand.nonEmpty) {
      val (c, u) = cand.dequeue()
      if (res.size >= ef && c < res.head._1) done = true
      else adj.getOrElse(u, Array.empty[Long]).foreach { v =>
        if (!visited.contains(v)) {
          visited += v
          val cv = cosine(q, vecs(v))
          if (res.size < ef || cv > res.head._1) {
            cand.enqueue((cv, v))
            res.enqueue((cv, v))
            if (res.size > ef) res.dequeue()
          }
        }
      }
    }
    res.toVector.map(t => (t._2, t._1)).sortBy(t => (-t._2, t._1))
  }

  /** Link ONE node into an existing layer (Malkov & Yashunin's insert
    * step): connect to the `m` nearest beam results from `entry`,
    * back-link, prune any neighbor list past `2m` keeping the
    * closest. Shared by the from-scratch build and [[insert]]. */
  private def insertNode(vecs: collection.Map[Long, Array[Double]],
      adj: collection.mutable.LinkedHashMap[Long, Array[Long]],
      entry: Long, m: Int, efC: Int, id: Long, v: Array[Double]): Unit = {
    val near = beam(vecs, adj, entry, v, efC).take(m)
    adj(id) = near.map(_._1).toArray
    near.foreach { case (nb, _) =>
      val cur = adj(nb) :+ id
      adj(nb) =
        if (cur.length <= 2 * m) cur
        else cur.map(x => (x, cosine(vecs(nb), vecs(x))))
          .sortBy(t => (-t._2, t._1)).take(2 * m).map(_._1)
    }
  }

  /** Sequential NSW insertion over `nodes` (ascending id): each node
    * rides [[insertNode]]; the first node is the layer's permanent
    * entry point. Returns the adjacency. */
  private def buildLayer(nodes: IndexedSeq[(Long, Array[Double])],
      m: Int, efC: Int): collection.mutable.LinkedHashMap[Long, Array[Long]] = {
    val vecs = nodes.toMap
    val adj = collection.mutable.LinkedHashMap[Long, Array[Long]]()
    var entry = -1L
    nodes.foreach { case (id, v) =>
      if (adj.isEmpty) { adj(id) = Array.empty; entry = id }
      else insertNode(vecs, adj, entry, m, efC, id, v)
    }
    adj
  }

  /** Build the sharded two-layer index. Output schema:
    * (shard INT, id LONG, vec ARRAY&lt;DOUBLE&gt;, nbrs ARRAY&lt;LONG&gt;,
    * upper BOOLEAN, unbrs ARRAY&lt;LONG&gt;) — persist with plain
    * `write.parquet`. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      nShards: Int = 16, m: Int = 8, efC: Int = 48,
      upperEvery: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col(idCol).cast(LongType),
        col(vecCol).cast(ArrayType(DoubleType)))
      .as[(Long, Array[Double])]
      .groupByKey(r => (math.floorMod(r._1, nShards.toLong)).toInt)
      .flatMapGroups { (shard, it) =>
        val nodes = it.toVector.sortBy(_._1)
        val base = buildLayer(nodes, m, efC)
        val upperNodes = nodes.filter(n =>
          math.floorMod(n._1, upperEvery.toLong) == 0L)
        val upperAdj = buildLayer(upperNodes, m, efC)
        nodes.iterator.map { case (id, v) =>
          (shard, id, v, base(id),
            upperAdj.contains(id),
            upperAdj.getOrElse(id, Array.empty[Long]), false)
        }
      }
      .toDF("shard", "id", "vec", "nbrs", "upper", "unbrs", "dead")
  }

  /** An index DataFrame with the `dead` tombstone column present —
    * indexes persisted before deletes existed lack it and read as
    * all-alive. */
  private def withDead(index: DataFrame): DataFrame =
    if (index.columns.contains("dead")) index
    else index.withColumn("dead", lit(false))

  /** INCREMENTAL insert: link a vector batch into a built (or
    * reloaded) index without rebuilding it. Each new id lands in its
    * hash shard; only TOUCHED shards re-link (their rows are
    * re-emitted — back-links from existing nodes to new ones change),
    * every other shard's rows pass through VERBATIM, so a
    * `partitionBy("shard")` parquet layout re-persists only the
    * touched partitions (dynamic partition overwrite). The insertion
    * replays [[insertNode]] over the existing adjacency in ascending
    * new-id order — deterministic given (index, batch); note an
    * inserted index is a VALID NSW graph but not byte-identical to a
    * from-scratch build of the union (HNSW graphs are
    * insertion-order-dependent by nature; search quality is what the
    * recall pins gate). `nShards`/`m`/`efC`/`upperEvery` must match
    * the build (the shard congruence is checked against the index's
    * own rows). Batch size is an ingest micro-batch (the touched
    * shard SET is a bounded driver collect; the batch rows ship in
    * the group join, never through the driver). */
  def insert(index: DataFrame, batch: DataFrame, idCol: String,
      vecCol: String, nShards: Int = 16, m: Int = 8, efC: Int = 48,
      upperEvery: Int = 16): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val newRows = batch.select(col(idCol).cast(LongType),
        col(vecCol).cast(ArrayType(DoubleType)))
      .as[(Long, Array[Double])]
    val touched = newRows
      .map(r => math.floorMod(r._1, nShards.toLong).toInt)
      .distinct().collect().toSeq
    val idxTyped = withDead(index)
      .select(col("shard"), col("id"), col("vec"), col("nbrs"),
        col("upper"), col("unbrs"), col("dead"))
      .as[(Int, Long, Array[Double], Array[Long], Boolean, Array[Long],
        Boolean)]
    val untouched = idxTyped.filter(!col("shard").isin(touched: _*))
    val existing = idxTyped.filter(col("shard").isin(touched: _*))
    val fresh = newRows
      .map(r => (math.floorMod(r._1, nShards.toLong).toInt, r._1, r._2))
    val relinked = existing.groupByKey(_._1)
      .cogroup(fresh.groupByKey(_._1)) { (shard, exIt, newIt) =>
        val ex = exIt.toVector.sortBy(_._2)
        val adds = newIt.toVector.sortBy(_._2)
        require(ex.headOption.forall(r =>
          math.floorMod(r._2, nShards.toLong) == shard),
          s"insert: nShards=$nShards does not match the index's " +
            "shard layout")
        val vecs = collection.mutable.HashMap[Long, Array[Double]]()
        ex.foreach(r => vecs(r._2) = r._3)
        adds.foreach(a => vecs(a._2) = a._3)
        // reconstruct both layers in ORIGINAL insertion order
        // (ascending id — the order build and prior inserts used), so
        // entry points match what the graph was grown from. Tombstoned
        // nodes stay in the graph as traversal waypoints; new links TO
        // them are fine (search filters them from results only).
        val dead = ex.iterator.filter(_._7).map(_._2)
          .to(collection.mutable.HashSet)
        val adj = collection.mutable.LinkedHashMap[Long, Array[Long]]()
        ex.foreach(r => adj(r._2) = r._4)
        val upAdj = collection.mutable.LinkedHashMap[Long, Array[Long]]()
        ex.iterator.filter(_._5).foreach(r => upAdj(r._2) = r._6)
        var entry = if (adj.nonEmpty) adj.head._1 else -1L
        var upEntry = if (upAdj.nonEmpty) upAdj.head._1 else -1L
        adds.foreach { case (_, id, v) =>
          require(!adj.contains(id), s"insert: id $id already indexed" +
            " (use upsert to replace a vector)")
          if (adj.isEmpty) { adj(id) = Array.empty; entry = id }
          else insertNode(vecs, adj, entry, m, efC, id, v)
          if (math.floorMod(id, upperEvery.toLong) == 0L) {
            if (upAdj.isEmpty) { upAdj(id) = Array.empty; upEntry = id }
            else insertNode(vecs, upAdj, upEntry, m, efC, id, v)
          }
        }
        adj.keysIterator.map { id =>
          (shard, id, vecs(id), adj(id),
            upAdj.contains(id), upAdj.getOrElse(id, Array.empty[Long]),
            dead.contains(id))
        }
      }
    untouched.union(relinked)
      .toDF("shard", "id", "vec", "nbrs", "upper", "unbrs", "dead")
  }

  /** DELETE vectors by id: shard-local TOMBSTONES (standard HNSW
    * practice — the node stays in the graph as a traversal waypoint,
    * [[search]] just never serves it), so a delete touches only the
    * flag column of its shard rows and untouched shards pass through
    * byte-identical. When a shard's tombstone fraction exceeds
    * `rebuildAt` it is REBUILT from its live vectors instead (both
    * layers, ascending-id order — same deterministic shape as
    * [[build]]): waypoint clutter degrades beam quality and wastes
    * bytes past that point, and the rebuild cost is bounded by one
    * shard. Ids absent from the index are ignored (idempotent
    * replays). */
  def delete(index: DataFrame, ids: DataFrame, idCol: String,
      nShards: Int = 16, m: Int = 8, efC: Int = 48,
      upperEvery: Int = 16, rebuildAt: Double = 0.3): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val delIds = ids.select(col(idCol).cast(LongType)).as[Long]
    val touched = delIds
      .map(i => math.floorMod(i, nShards.toLong).toInt)
      .distinct().collect().toSeq
    val idxTyped = withDead(index)
      .select(col("shard"), col("id"), col("vec"), col("nbrs"),
        col("upper"), col("unbrs"), col("dead"))
      .as[(Int, Long, Array[Double], Array[Long], Boolean, Array[Long],
        Boolean)]
    val untouched = idxTyped.filter(!col("shard").isin(touched: _*))
    val existing = idxTyped.filter(col("shard").isin(touched: _*))
    val delByShard = delIds
      .map(i => (math.floorMod(i, nShards.toLong).toInt, i))
    val masked = existing.groupByKey(_._1)
      .cogroup(delByShard.groupByKey(_._1)) { (shard, exIt, delIt) =>
        val ex = exIt.toVector.sortBy(_._2)
        val del = delIt.map(_._2).to(collection.mutable.HashSet)
        val flagged = ex.map(r =>
          if (del.contains(r._2)) r.copy(_7 = true) else r)
        val nDead = flagged.count(_._7)
        if (ex.isEmpty || nDead.toDouble / ex.size <= rebuildAt)
          flagged.iterator
        else {
          // tombstones past the threshold: rebuild this shard from
          // its live vectors (deterministic ascending-id relink)
          val live = flagged.filterNot(_._7).map(r => (r._2, r._3))
          val base = buildLayer(live, m, efC)
          val upperAdj = buildLayer(live.filter(n =>
            math.floorMod(n._1, upperEvery.toLong) == 0L), m, efC)
          live.iterator.map { case (id, v) =>
            (shard, id, v, base(id), upperAdj.contains(id),
              upperAdj.getOrElse(id, Array.empty[Long]), false)
          }
        }
      }
    untouched.union(masked)
      .toDF("shard", "id", "vec", "nbrs", "upper", "unbrs", "dead")
  }

  /** UPSERT: replace (or add) each batch vector under its id. A
    * replaced vector cannot keep its old adjacency — the links encode
    * the OLD position in the metric space — so every touched shard is
    * REBUILT from (its live vectors with batch replacements applied) ∪
    * (new batch ids), both layers, ascending-id order; prior
    * tombstones fall away with the rebuild. Untouched shards pass
    * through byte-identical, so the dynamic-partition-overwrite
    * persistence shape (st14) applies unchanged. Cost is bounded by
    * the touched shard set — the batch is an ingest micro-batch, as
    * in [[insert]]. */
  def upsert(index: DataFrame, batch: DataFrame, idCol: String,
      vecCol: String, nShards: Int = 16, m: Int = 8, efC: Int = 48,
      upperEvery: Int = 16): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val newRows = batch.select(col(idCol).cast(LongType),
        col(vecCol).cast(ArrayType(DoubleType)))
      .as[(Long, Array[Double])]
    val touched = newRows
      .map(r => math.floorMod(r._1, nShards.toLong).toInt)
      .distinct().collect().toSeq
    val idxTyped = withDead(index)
      .select(col("shard"), col("id"), col("vec"), col("nbrs"),
        col("upper"), col("unbrs"), col("dead"))
      .as[(Int, Long, Array[Double], Array[Long], Boolean, Array[Long],
        Boolean)]
    val untouched = idxTyped.filter(!col("shard").isin(touched: _*))
    val existing = idxTyped.filter(col("shard").isin(touched: _*))
    val fresh = newRows
      .map(r => (math.floorMod(r._1, nShards.toLong).toInt, r._1, r._2))
    val rebuilt = existing.groupByKey(_._1)
      .cogroup(fresh.groupByKey(_._1)) { (shard, exIt, newIt) =>
        val replaced = newIt.map(r => (r._2, r._3)).toMap
        val kept = exIt.filter(r => !r._7 && !replaced.contains(r._2))
          .map(r => (r._2, r._3)).toVector
        val nodes = (kept ++ replaced.toVector).sortBy(_._1)
        val base = buildLayer(nodes, m, efC)
        val upperAdj = buildLayer(nodes.filter(n =>
          math.floorMod(n._1, upperEvery.toLong) == 0L), m, efC)
        nodes.iterator.map { case (id, v) =>
          (shard, id, v, base(id), upperAdj.contains(id),
            upperAdj.getOrElse(id, Array.empty[Long]), false)
        }
      }
    untouched.union(rebuilt)
      .toDF("shard", "id", "vec", "nbrs", "upper", "unbrs", "dead")
  }

  /** Top-k cosine search over a built (or reloaded) index: greedy
    * descent on the upper layer to an entry, `ef`-beam on the base
    * layer, per-shard top-k merged globally. Queries are a SMALL
    * serving batch (collected and shipped in the task closure).
    * Output: (query_id, rank, corpus_id, cos), self-matches
    * excluded. */
  def search(index: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5, ef: Int = 64): DataFrame = {
    val spark = index.sparkSession
    import spark.implicits._
    val qs = queries.select(col(idCol).cast(LongType),
        col(vecCol).cast(ArrayType(DoubleType)))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
    val local = withDead(index)
      .select(col("shard"), col("id"), col("vec"), col("nbrs"),
        col("upper"), col("unbrs"), col("dead"))
      .as[(Int, Long, Array[Double], Array[Long], Boolean, Array[Long],
        Boolean)]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val rows = it.toVector.sortBy(_._2)
        val vecs = rows.iterator.map(r => r._2 -> r._3).toMap
        val adj = rows.iterator.map(r => r._2 -> r._4).toMap
        val upAdj = rows.iterator.filter(_._5)
          .map(r => r._2 -> r._6).toMap
        // tombstoned ids: beam THROUGH them (waypoints keep the graph
        // navigable), never serve them
        val dead = rows.iterator.filter(_._7).map(_._2)
          .to(collection.immutable.HashSet)
        val upEntry =
          if (upAdj.nonEmpty) upAdj.keysIterator.min
          else rows.head._2
        qs.iterator.flatMap { case (qid, qv) =>
          // greedy (ef = 1) on the upper layer picks the entry
          val entry =
            if (upAdj.isEmpty) upEntry
            else beam(vecs, upAdj, upEntry, qv, 1).head._1
          beam(vecs, adj, entry, qv, ef)
            .filter(t => t._1 != qid && !dead.contains(t._1))
            .take(k)
            .map { case (cid, c) => (qid, cid, c) }
        }
      }
      .toDF("query_id", "corpus_id", "cos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("corpus_id").asc)
    local.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cos"))
  }
}
