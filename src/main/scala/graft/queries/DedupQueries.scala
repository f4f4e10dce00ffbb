package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, TextOps}

/** Deduplication harness queries over the `documents` table.
  *
  * Every query here has an exact DuckDB oracle. d3 (MinHash+LSH) and
  * d4 (SimHash) run the DETERMINISTIC md5-hash variants so the full
  * pipelines — signatures, band/chunk buckets, verification — replay
  * bit-for-bit in SQL; the xxhash64 fast paths (8-byte shuffle keys)
  * remain the library defaults and keep their ScalaTest recall specs.
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

    // incremental exact dedup against a PERSISTENT fingerprint store —
    // the continuous-ingestion shape: day-1 fingerprints land in a
    // snapshot table; the day-2 batch anti-joins the store (cross-batch
    // dedup), keeps min doc_id per new fingerprint (within-batch), and
    // appends what it accepted. The store read is a plain snapshot
    // scan, the anti-join shuffles fingerprints (16-byte keys), never
    // document text.
    "d8_incremental_dedup" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val store = java.nio.file.Files
        .createTempDirectory("graft_d8").toString + "/fp"
      // the corpus has near-dups but zero EXACT dups, so the
      // cross-batch arm is made provably non-vacuous the t11 way:
      // every doc_id % 10 == 1 day-2 doc deterministically borrows its
      // even predecessor's fingerprint (replayed identically in SQL)
      val raw = Tables(s, dir, "documents").select(col("doc_id"),
        graft.operators.TextOps.fingerprint(col("text")).as("fp"))
      val prev = raw.select((col("doc_id") + 1).as("doc_id"),
        col("fp").as("fp_prev"))
      val fp = raw.join(prev, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 1 && col("fp_prev").isNotNull,
            col("fp_prev")).otherwise(col("fp")).as("fp"))
      val day1 = fp.filter(col("doc_id") % 2 === 0)
      val day2 = fp.filter(col("doc_id") % 2 =!= 0)
      SnapshotTable.create(day1.select(col("fp")).distinct(), store)
      val accepted = day2
        .join(SnapshotTable.read(s, store), Seq("fp"), "left_anti")
        .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      SnapshotTable.append(accepted.select(col("fp")), store)
      val storeSize = SnapshotTable.read(s, store).distinct().count()
      accepted.select(col("doc_id"), col("fp"))
        .withColumn("store_distinct", lit(storeSize))
        .orderBy(col("doc_id"))
    }),

    // exact 3-gram Jaccard near-dup pairs (PPJoin prefix+positional
    // filtering, ≥ 0.8); shares the persisted shingle pass with d3
    "d2_ngram_jaccard" -> ((s, dir) => {
      Dedup.ngramJaccardPairsFromSets(sharedSets(s, dir), threshold = 0.8)
        .orderBy(col("i"), col("j"))
    }),

    // MinHash+LSH near-dup pairs, exact-verified — the DETERMINISTIC
    // md5-hash variant, so the full pipeline (signatures, band buckets,
    // Jaccard verify) replays bit-for-bit in DuckDB (exact oracle);
    // shares the persisted token pass with d2/d4
    "d3_minhash_lsh" -> ((s, dir) => {
      Dedup.minHashLshPairsDeterministic(sharedTokens(s, dir), k = 3,
          numHashes = 32, bands = 8, threshold = 0.8)
        .orderBy(col("i"), col("j"))
    }),

    // SimHash near-dup pairs, hamming ≤ 3 — the DETERMINISTIC 60-bit
    // md5 variant (exact DuckDB oracle); shares the persisted token
    // pass with d2/d3
    "d4_simhash" -> ((s, dir) => {
      Dedup.simHashPairsDeterministic(sharedTokens(s, dir), maxDist = 3)
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
    }),

    // two-tier fuzzy dedup: PPJoin candidates at a loose Jaccard floor
    // (0.6), verified by threshold-bounded edit distance (≤ 6) on the
    // normalized text — candidates the verify rejects prove the tiers
    // do different work
    "d7_edit_verified" -> ((s, dir) => {
      Dedup.editVerifiedPairs(Tables(s, dir, "documents"), "doc_id",
          "text", k = 3, jaccardFloor = 0.6, maxEdit = 6)
        .orderBy(col("i"), col("j"))
    }),

    // fuzzy pairs verified by the NATIVE Jaro-Winkler expression
    // (d7's edit-distance twin; prefix-weighted similarity over the
    // same PPJoin candidate set, rounded to 6 decimals so DuckDB's
    // jaro_winkler_similarity replays it exactly)
    "d9_jaro_verified" -> ((s, dir) => {
      Dedup.jaroVerifiedPairs(Tables(s, dir, "documents"), "doc_id",
          "text", k = 3, jaccardFloor = 0.6, jwThreshold = 0.9)
        .orderBy(col("i"), col("j"))
    }),

    // passage-level exact dedup: aligned 8-token chunks, first corpus
    // occurrence wins, survivors reassembled in document order
    "d6_passage_dedup" -> ((s, dir) => {
      Dedup.passageDedup(Tables(s, dir, "documents"), "doc_id", "text",
          k = 8)
        .orderBy(col("doc_id"))
    }),

    // the full curation pipeline, composed end-to-end from this
    // library's operators: Gopher quality filter → exact near-dup
    // clustering among survivors → keep one representative per cluster
    // → benchmark decontamination. Oracled in one DuckDB statement
    // (incl. the recursive-CTE clustering) — the "could a reference
    // user run their whole pipeline here" demo
    "c1_curation_pipeline" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      // gopherFilter packages the safe staging (projected decision
      // column + checkpoint barrier — see its scaladoc for why a plain
      // .filter(gopherPass(...)) is a pushdown-inlining trap). The
      // repartition spreads the per-doc metric math across cores: a
      // small parquet is one input split (same rationale as
      // Dedup.tokenize's repartition-before-tokenize).
      val quality = TextOps.gopherFilter(
        docs.repartition(s.sparkContext.defaultParallelism), "text")
        .select(col("doc_id"), col("text"))
      val pairs = Dedup.ngramJaccardPairs(quality, "doc_id", "text",
        k = 3, threshold = 0.8)
      val reps = Dedup.connectedComponents(quality, "doc_id", pairs)
        .filter(col("doc_id") === col("cluster_id"))
        .select(col("doc_id"))
      val kept = quality.join(reps, Seq("doc_id"))
      Dedup.contaminatedAgainst(kept,
          docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", k = 4)
        .filter(!col("is_contaminated"))
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    }),

    // the pretraining-mix pipeline: token-count quality floor →
    // corpus-level passage dedup (first occurrence wins) →
    // deterministic 50% hash sample → per-language doc/token budget
    // report. Every stage is an already-oracled operator, and the
    // whole composition replays as ONE chained-CTE DuckDB statement —
    // the "assemble a training mix end-to-end" demo next to c1's
    // cleaning demo. Scale shape: the only wide ops are d6's 8-byte
    // chunk-hash agg/join and the final per-language agg; the sample
    // is a scan-stage predicate.
    "c7_pretraining_mix" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val quality = docs.filter(TextOps.tokenCount(col("text")) >= 30)
        .select(col("doc_id"), col("lang"), col("text"))
      val deduped = Dedup.passageDedup(quality, "doc_id", "text", k = 8)
      val sampled = graft.operators.Sketches.hashSample(
        deduped, col("doc_id"), fraction = 0.5)
      sampled.join(quality.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text_clean"))).as("n_tokens"))
        .orderBy(col("lang"))
    })
  )

  /** The 32 MinHash permutation coefficients as SQL VALUES rows — the
    * SAME `Dedup.permCoeffs` the Spark side uses, so the oracle replays
    * the identical permutations. */
  private val permValues = (0 until 32).map { i =>
    val (a, b) = Dedup.permCoeffs(i)
    s"($i, $a, $b)"
  }.mkString(", ")

  val oracles: Map[String, String] = Map(
    "d3_minhash_lsh" ->
      s"""WITH toks AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id,
        |    unnest(list_distinct(CASE WHEN len(t) >= 3
        |      THEN list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |      ELSE [] END)) AS s
        |  FROM toks),
        |hs AS (SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS h FROM sh),
        |perms(pi, pa, pb) AS (VALUES $permValues),
        |mins AS (SELECT doc_id, pi,
        |    min((pa * (h % 2147483647) + pb) % 2147483647) AS m
        |  FROM hs CROSS JOIN perms GROUP BY 1, 2),
        |sig AS (SELECT doc_id, list(m ORDER BY pi) AS sig FROM mins GROUP BY 1),
        |banded AS (SELECT doc_id, band,
        |    CAST(('0x' || substr(md5(array_to_string(sig[(band*4+1):(band*4+4)], ',')), 1, 15)) AS BIGINT) AS bh
        |  FROM sig CROSS JOIN (SELECT unnest(range(0, 8)) AS band) r),
        |cand AS (SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
        |sizes AS (SELECT doc_id, count(*) AS n FROM hs GROUP BY 1),
        |inter AS (SELECT cd.i AS i, cd.j AS j, count(*) AS c
        |  FROM cand cd
        |  JOIN hs x ON x.doc_id = cd.i
        |  JOIN hs y ON y.doc_id = cd.j AND y.h = x.h
        |  GROUP BY 1, 2)
        |SELECT i, j, c * 1.0 / (sa.n + sb.n - c) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.doc_id = i
        |JOIN sizes sb ON sb.doc_id = j
        |WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8
        |ORDER BY i, j""".stripMargin,

    "d4_simhash" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
        |  FROM documents),
        |ht AS (SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        |  FROM (SELECT doc_id, unnest(t) AS tok FROM toks)),
        |bits AS (SELECT doc_id, j,
        |    CASE WHEN sum(CASE WHEN (h >> CAST(j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) > 0
        |      THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE CAST(0 AS BIGINT) END AS bit
        |  FROM ht CROSS JOIN (SELECT unnest(range(0, 60)) AS j) r
        |  GROUP BY doc_id, j),
        |shh AS (SELECT doc_id, CAST(sum(bit) AS BIGINT) AS sh FROM bits GROUP BY 1),
        |ch AS (SELECT doc_id, sh, c AS chunk, (sh >> CAST(c * 15 AS INTEGER)) & 32767 AS cv
        |  FROM shh CROSS JOIN (SELECT unnest(range(0, 4)) AS c) r)
        |SELECT DISTINCT a.doc_id AS i, b.doc_id AS j,
        |  CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS dist
        |FROM ch a JOIN ch b
        |  ON a.chunk = b.chunk AND a.cv = b.cv AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3
        |ORDER BY i, j""".stripMargin,

    "d1_exact_dedup" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
        |  min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "d8_incremental_dedup" ->
      """WITH raw AS (SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |  FROM documents),
        |fp AS (SELECT a.doc_id,
        |    CASE WHEN a.doc_id % 10 = 1 AND b.fp IS NOT NULL
        |      THEN b.fp ELSE a.fp END AS fp
        |  FROM raw a LEFT JOIN raw b ON a.doc_id = b.doc_id + 1),
        |day1 AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0),
        |day2 AS (SELECT doc_id, fp FROM fp WHERE doc_id % 2 <> 0),
        |accepted AS (SELECT fp, min(doc_id) AS doc_id FROM day2
        |  WHERE fp NOT IN (SELECT fp FROM day1) GROUP BY fp),
        |store AS (SELECT count(DISTINCT fp) AS n FROM (
        |  SELECT fp FROM day1 UNION ALL SELECT fp FROM accepted))
        |SELECT doc_id, fp, (SELECT n FROM store) AS store_distinct
        |FROM accepted ORDER BY doc_id""".stripMargin,

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
        |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,

    "d7_edit_verified" ->
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
        |  GROUP BY 1, 2),
        |pairs AS (SELECT i, j FROM inter
        |  JOIN sizes sa ON sa.doc_id = i
        |  JOIN sizes sb ON sb.doc_id = j
        |  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.6),
        |n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS txt
        |  FROM documents)
        |SELECT p.i, p.j, levenshtein(a.txt, b.txt) AS edit_dist
        |FROM pairs p JOIN n a ON a.doc_id = p.i JOIN n b ON b.doc_id = p.j
        |WHERE levenshtein(a.txt, b.txt) <= 6
        |ORDER BY p.i, p.j""".stripMargin,

    "d9_jaro_verified" ->
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
        |  GROUP BY 1, 2),
        |pairs AS (SELECT i, j FROM inter
        |  JOIN sizes sa ON sa.doc_id = i
        |  JOIN sizes sb ON sb.doc_id = j
        |  WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.6),
        |n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS txt
        |  FROM documents)
        |SELECT p.i, p.j, round(jaro_winkler_similarity(a.txt, b.txt), 6) AS jw
        |FROM pairs p JOIN n a ON a.doc_id = p.i JOIN n b ON b.doc_id = p.j
        |WHERE round(jaro_winkler_similarity(a.txt, b.txt), 6) >= 0.9
        |ORDER BY p.i, p.j""".stripMargin,

    "d6_passage_dedup" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |ch AS (SELECT doc_id, unnest(list_transform(range(0, CAST(ceil(len(toks)/8.0) AS BIGINT)),
        |    i -> struct_pack(chunk_idx := i, chunk := list_aggregate(toks[(i*8+1):(i*8+8)], 'string_agg', ' ')))) AS c
        |  FROM t WHERE len(toks) > 0),
        |f AS (SELECT doc_id, c.chunk_idx AS chunk_idx, c.chunk AS chunk FROM ch),
        |own AS (SELECT chunk, min(struct_pack(doc_id := doc_id, chunk_idx := chunk_idx)) AS o
        |  FROM f GROUP BY 1),
        |kept AS (SELECT f.doc_id, f.chunk_idx, f.chunk
        |  FROM f JOIN own ON f.chunk = own.chunk
        |  WHERE f.doc_id = (own.o).doc_id AND f.chunk_idx = (own.o).chunk_idx)
        |SELECT doc_id, count(*) AS n_kept,
        |  string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_clean
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "c1_curation_pipeline" ->
      """WITH RECURSIVE tq AS (SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |gq AS (SELECT doc_id, text, toks,
        |    CASE WHEN len(toks) >= 2
        |      THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |      ELSE [] END AS grams,
        |    list_filter(list_transform(string_split_regex(text, '\n'), l -> trim(l)), l -> l <> '') AS lns
        |  FROM tq),
        |mq AS (SELECT doc_id, text, toks, grams, lns,
        |    CASE WHEN len(grams) > 0 THEN
        |      list_max(list_transform(list_distinct(grams), x -> len(list_filter(grams, y -> y = x))))
        |      ELSE 0 END AS maxcnt
        |  FROM gq),
        |quality AS (SELECT doc_id, text, toks FROM mq
        |  WHERE (len(toks) BETWEEN 50 AND 100000)
        |    AND (CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) BETWEEN 3.0 AND 10.0)
        |    AND (CAST((length(text) - length(replace(text, '#', ''))) +
        |         (length(text) - length(replace(text, '...', ''))) / 3 AS DOUBLE) / len(toks)) < 0.1
        |    AND (CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) / len(toks)) > 0.8
        |    AND (CASE WHEN len(grams) > 0 THEN maxcnt * length(list_max(list_filter(list_distinct(grams),
        |        x -> len(list_filter(grams, y -> y = x)) = maxcnt))) * 1.0 / length(text) ELSE 0.0 END) < 0.2
        |    AND (CASE WHEN len(lns) > 0 THEN
        |        CAST(len(list_filter(lns, x -> len(list_filter(lns, y -> y = x)) > 1)) AS DOUBLE) / len(lns)
        |      ELSE 0.0 END) < 0.3),
        |sh AS (SELECT doc_id,
        |    unnest(list_distinct(CASE WHEN len(toks) >= 3
        |      THEN list_transform(range(1, len(toks) - 1),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |      ELSE [] END)) AS s
        |  FROM quality),
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
        |  SELECT doc_id, doc_id FROM quality
        |  UNION
        |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
        |comp AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY 1),
        |reps AS (SELECT q.doc_id, q.toks FROM quality q JOIN comp c ON q.doc_id = c.doc_id
        |  WHERE c.doc_id = c.cluster_id),
        |bt AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id % 50 = 0),
        |bg AS (SELECT DISTINCT unnest(list_distinct(CASE WHEN len(toks) >= 4
        |    THEN list_transform(range(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
        |    ELSE [] END)) AS s
        |  FROM bt),
        |rg AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 4
        |    THEN list_transform(range(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
        |    ELSE [] END)) AS s
        |  FROM reps),
        |hits AS (SELECT DISTINCT rg.doc_id FROM rg JOIN bg USING (s))
        |SELECT r.doc_id FROM reps r LEFT JOIN hits h ON r.doc_id = h.doc_id
        |WHERE h.doc_id IS NULL ORDER BY r.doc_id""".stripMargin,

    "c7_pretraining_mix" ->
      """WITH q AS (SELECT doc_id, lang, text FROM (
        |    SELECT doc_id, lang, text,
        |      len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS nt
        |    FROM documents) WHERE nt >= 30),
        |t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM q),
        |ch AS (SELECT doc_id, unnest(list_transform(range(0, CAST(ceil(len(toks)/8.0) AS BIGINT)),
        |    i -> struct_pack(chunk_idx := i, chunk := list_aggregate(toks[(i*8+1):(i*8+8)], 'string_agg', ' ')))) AS c
        |  FROM t WHERE len(toks) > 0),
        |f AS (SELECT doc_id, c.chunk_idx AS chunk_idx, c.chunk AS chunk FROM ch),
        |own AS (SELECT chunk, min(struct_pack(doc_id := doc_id, chunk_idx := chunk_idx)) AS o
        |  FROM f GROUP BY 1),
        |kept AS (SELECT f.doc_id, f.chunk_idx, f.chunk
        |  FROM f JOIN own ON f.chunk = own.chunk
        |  WHERE f.doc_id = (own.o).doc_id AND f.chunk_idx = (own.o).chunk_idx),
        |dd AS (SELECT doc_id, string_agg(chunk, ' ' ORDER BY chunk_idx) AS text_clean
        |  FROM kept GROUP BY doc_id),
        |samp AS (SELECT doc_id, text_clean FROM dd
        |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 5000)
        |SELECT q.lang, count(*) AS n_docs,
        |  CAST(sum(len(list_filter(regexp_split_to_array(lower(text_clean), '\s+'), x -> x <> ''))) AS BIGINT) AS n_tokens
        |FROM samp JOIN q USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
