package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Deduplication harness queries over the `documents` table.
  *
  * d1/d2 have exact DuckDB oracles. d3 (MinHash+LSH) and d4 (SimHash)
  * use engine-specific hash functions (xxhash64) that no portable SQL
  * reproduces — the driver records rows-only checks; their semantics are
  * covered by ScalaTest (candidate sets ⊇ true near-dup pairs).
  */
object DedupQueries {

  /** One persisted token pass per (session, dir), shared by d2/d3
    * (shingle sets) and d4 (SimHash) — tokenization is the dominant
    * common cost. Keyed by the SparkSession OBJECT (identity hashes can
    * collide between a live and a stopped session); entries owned by
    * stopped sessions are pruned on access so the map never serves a
    * DataFrame bound to a dead session and never grows without bound.
    * Note: the cache assumes `dir`'s data is immutable for the session's
    * lifetime (true for the harness fixtures). */
  private val passCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (DataFrame, DataFrame)]
  private def sharedPass(s: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    passCache.filterInPlace { case ((sess, _), _) =>
      !sess.sparkContext.isStopped
    }
    passCache.getOrElseUpdate((s, dir), {
      val toks = Dedup.tokenize(Tables(s, dir, "documents"), "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (toks, Dedup.shingleSetsFromTokens(toks, k = 3))
    })
  }
  private def sharedTokens(s: SparkSession, dir: String): DataFrame =
    sharedPass(s, dir)._1
  private def sharedSets(s: SparkSession, dir: String): DataFrame =
    sharedPass(s, dir)._2

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact dedup via normalized-text fingerprint
    "d1_exact_dedup" -> ((s, dir) => {
      Dedup.exactDedup(Tables(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("fingerprint"))
    }),

    // exact 3-gram Jaccard near-dup pairs (PPJoin prefix+positional
    // filtering, ≥ 0.8); shares the persisted shingle pass with d3
    "d2_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairsFromSets(sharedSets(s, dir), threshold = 0.8)
        .orderBy(col("i"), col("j"))
    }),

    // MinHash+LSH near-dup pairs, exact-verified (rows-only check)
    "d3_minhash_lsh" -> ((s, dir) => {
      Dedup.minHashLshPairsFromSets(sharedSets(s, dir), numHashes = 32,
          bands = 8, threshold = 0.8)
        .orderBy(col("i"), col("j"))
    }),

    // SimHash near-dup pairs, hamming ≤ 3 (rows-only check); shares the
    // persisted token pass with d2/d3
    "d4_simhash" -> ((s, dir) => {
      Dedup.simHashPairsFromTokens(sharedTokens(s, dir), maxDist = 3)
        .orderBy(col("i"), col("j"))
    }),

    // near-dup clusters: connected components over the exact-Jaccard
    // pair graph — every doc labeled with the min doc id reachable
    // (exact DuckDB oracle via recursive CTE)
    "d5_dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairsFromSets(sharedSets(s, dir),
        threshold = 0.8)
      Dedup.connectedComponents(Tables(s, dir, "documents"), "doc_id", pairs)
        .orderBy(col("doc_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "d1_exact_dedup" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
        |  min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "d2_ngram_jaccard" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |    unnest(list_distinct(CASE WHEN len(t) >= 3
        |      THEN list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |      ELSE [] END)) AS s
        |  FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT i, j, c * 1.0 / (sa.n + sb.n - c) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = i
        |JOIN sizes sb ON sb.doc_id = j
        |WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8
        |ORDER BY i, j""".stripMargin,

    "d5_dedup_clusters" ->
      """WITH RECURSIVE toks AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |    unnest(list_distinct(CASE WHEN len(t) >= 3
        |      THEN list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |      ELSE [] END)) AS s
        |  FROM toks),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS i, b.doc_id AS j, count(*) AS c
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (SELECT i, j FROM inter
        |  JOIN sizes sa ON sa.doc_id = i
        |  JOIN sizes sb ON sb.doc_id = j
        |  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8),
        |edges AS (SELECT i AS src, j AS dst FROM pairs
        |  UNION ALL SELECT j, i FROM pairs),
        |reach(id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id)
        |SELECT id AS doc_id, min(label) AS cluster_id
        |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
