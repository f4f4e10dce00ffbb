package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Ranking, TextOps}

/** Text-analysis harness queries over the `documents` table. */
object TextQueries {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is",
    "that", "row", "value", "table", "data")
  private val stopwordsSqlList = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting: whitespace + BPE-ish regex
    "t1_token_count" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.bpeishTokenCount(col("text")).as("n_bpeish"),
          length(col("text")).as("n_chars_computed"))
        .orderBy(col("doc_id"))
    }),

    // PII redaction: emails / IPv4 / card-length digit runs / intl
    // phone numbers → typed placeholders, one codegen'd regexp chain,
    // counts with replace-consistent semantics. The corpus text gets
    // deterministic synthetic PII appended (built from doc_id in BOTH
    // engines) so the pass is provably non-vacuous on every row.
    "t11_pii_scrub" -> ((s, dir) => {
      val aug = concat(col("text"),
        lit(" contact u"), col("doc_id").cast("string"), lit("@ex.com"),
        lit(" ip 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"),
        lit(" card 4111111111111111 tel +33 1 2345 6789"))
      val counts = TextOps.piiCounts(col("aug"))
        .map { case (name, c) => c.as(s"n_$name") }
      Tables(s, dir, "documents")
        .withColumn("aug", aug)
        .select(col("doc_id") +: counts :+
          md5(TextOps.piiScrub(col("aug"))).as("scrub_fp"): _*)
        .orderBy(col("doc_id"))
    }),

    // context-length chunking: 64-token windows advancing by 48 (25%
    // overlap) — the training-data windowing pass; chunks are emitted
    // as md5 fingerprints (exact content check, bounded row width)
    "t12_chunking" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.chunkTokens(col("text"), chunk = 64, stride = 48))
            .as("c"))
        .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
          md5(col("c.chunk")).as("chunk_fp"),
          col("c.n_chunk_tokens").as("n_chunk_tokens"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // quality signals: punct ratio, stopword ratio, mean word length
    "t2_quality" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          TextOps.punctRatio(col("text")).as("punct_ratio"),
          TextOps.stopwordRatio(col("text"), stopwords).as("stopword_ratio"),
          TextOps.meanWordLen(col("text")).as("mean_word_len"))
        .orderBy(col("doc_id"))
    }),

    // language id: marker-word heuristic with deterministic tie-break
    "t3_langid" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang").as("lang_declared"),
          TextOps.langId(col("text")).as("lang_detected"))
        .orderBy(col("doc_id"))
    }),

    // C4-style cleanup: lowercase/tokenize, scrub URL+email tokens,
    // collapse consecutive-duplicate runs, truncate to 64 tokens —
    // all scan-stage array math, zero shuffles, zero UDFs
    "t10_normalize" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("toks", TextOps.tokens(col("text")))
        .withColumn("clean_toks",
          TextOps.collapseRepeats(TextOps.scrubUrlsEmails(col("toks"))))
        .select(col("doc_id"),
          array_join(slice(col("clean_toks"), 1, 64), " ").as("clean"),
          size(col("toks")).as("n_tokens"),
          size(col("clean_toks")).as("n_clean"))
        .orderBy(col("doc_id"))
    }),

    // document fingerprinting: md5 of whitespace-normalized text
    "t4_fingerprint" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    }),

    // Gopher-style repetition / quality-filter metrics (token, 2-gram
    // and line arrays materialized once; each metric is pure scan-stage
    // column math)
    "t5_gopher_quality" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("toks", TextOps.tokens(col("text")))
        .withColumn("grams", Dedup.shinglesOfTokens(col("toks"), 2))
        .withColumn("lns", TextOps.lines(col("text")))
        .select(col("doc_id"),
          TextOps.topNgramCharFrac(col("text"), col("grams"))
            .as("top2gram_char_frac"),
          TextOps.dupNgramCharFrac(col("text"), col("grams"))
            .as("dup2gram_char_frac"),
          TextOps.symbolWordRatio(col("text"), col("toks"))
            .as("symbol_word_ratio"),
          TextOps.alphaWordFrac(col("toks")).as("alpha_word_frac"),
          TextOps.dupLineFrac(col("lns")).as("dup_line_frac"),
          TextOps.gopherPass(col("text"), col("toks"), col("grams"),
            col("lns")).as("gopher_pass"))
        .orderBy(col("doc_id"))
    }),

    // BM25 ranked retrieval: top-25 documents for a 4-term query
    // (score rounded to 6 decimals for cross-engine float compare)
    "t6_bm25" -> ((s, dir) => {
      Ranking.bm25TopK(Tables(s, dir, "documents"), "doc_id", "text",
          terms = bm25Terms, k = 25)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
    }),

    // benchmark decontamination: flag docs sharing any word 4-gram with
    // the benchmark subset (doc_id % 50 == 0)
    "t7_decontaminate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      Dedup.contaminatedAgainst(docs,
          docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", k = 4)
        .orderBy(col("doc_id"))
    }),

    // decontamination in the LARGE-benchmark regime: bit-identical
    // result to t7, but via a bloom-prefiltered shuffle semi-join —
    // the plan shape for a benchmark set too big to broadcast (the
    // bloom is the only driver-collected artifact, bounded by numBits)
    "t13_bloom_decontaminate" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      Dedup.contaminatedAgainstBloom(docs,
          docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", k = 4)
        .orderBy(col("doc_id"))
    }),

    // exact corpus heavy hitters: tokens above 2% of all occurrences
    "t8_heavy_hitters" -> ((s, dir) => {
      graft.operators.Sketches.heavyHitters(
          Tables(s, dir, "documents"), "text", minFrac = 0.02)
        .orderBy(col("token"))
    }),

    // bigram language-model NLL scoring (the CCNet quality signal):
    // add-1 smoothed bigram LM fit on the corpus itself, every document
    // scored with its mean negative log-likelihood
    "t9_lm_nll" -> ((s, dir) => {
      graft.operators.LanguageModel.bigramNll(
          Tables(s, dir, "documents"), "doc_id", "text", alpha = 1.0)
        .orderBy(col("doc_id"))
    }),

    // static data mixing: per-language quotas, best documents first
    // (rank by quality inside each language, keep the top quota(lang))
    "c4_domain_mix" -> ((s, dir) => {
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextOps.stopwordRatio(col("text"), stopwords).as("quality"))
      graft.operators.Sketches.quotaSelect(scored, "lang",
          Seq(col("quality").desc, col("doc_id").asc), mixQuotas)
        .select(col("doc_id"), col("lang"), col("stratum_rank"))
        .orderBy(col("doc_id"))
    }),

    // temperature-smoothed mixture sampling (weight ∝ n^0.5 flattens
    // the language distribution toward uniform): ~150 expected rows
    // split across languages by smoothed share, drawn with the
    // deterministic md5 predicate — reproducible on any engine
    "c6_temperature_mix" -> ((s, dir) => {
      graft.operators.Sketches.temperatureSample(
          Tables(s, dir, "documents"), "lang", col("doc_id"),
          budgetRows = 150, alpha = 0.5)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // CCNet-style head/middle/tail selection, composed end-to-end from
    // library operators: detect language (t3's heuristic) → score with
    // the corpus bigram LM (t9) → per-language ntile(3) perplexity
    // buckets → keep head+middle. ntile on (rounded nll, doc_id) keeps
    // the bucketing integer-exact across engines. At extreme scale the
    // per-language sort swaps for approxQuantilesByGroup thresholds
    // (a12's path); the semantics gate stays this exact form.
    "c5_ccnet_buckets" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val scored = graft.operators.LanguageModel.bigramNll(
        docs, "doc_id", "text")
      val withLang = docs.select(col("doc_id"),
        TextOps.langId(col("text")).as("lang_detected"))
      val w = Window.partitionBy(col("lang_detected"))
        .orderBy(col("nll"), col("doc_id"))
      scored.join(withLang, "doc_id")
        .withColumn("bucket", ntile(3).over(w))
        .filter(col("bucket") <= 2)
        .select(col("doc_id"), col("lang_detected"), col("bucket"),
          col("nll"))
        .orderBy(col("doc_id"))
    }),

    // token-budget selection (the data-mixing primitive: best documents
    // first until the token budget is spent): rank by quality, take the
    // prefix whose cumulative token count fits. The cumulative sum is
    // the DISTRIBUTED prefix-sum (range partitions + per-partition
    // windows + broadcast offsets) — never a global single-task window.
    "c3_token_budget" -> ((s, dir) => {
      val scored = Tables(s, dir, "documents")
        .select(col("doc_id"),
          graft.operators.TextOps.tokenCount(col("text")).as("n_tokens"),
          graft.operators.TextOps.stopwordRatio(col("text"), stopwords)
            .as("quality"))
      graft.operators.Aggregates.globalCumSum(scored,
          Seq(col("quality").desc, col("doc_id").asc), col("n_tokens"),
          "cum_tokens")
        .filter(col("cum_tokens") <= 10000)
        .select(col("doc_id"), col("n_tokens"), col("cum_tokens"))
        .orderBy(col("doc_id"))
    }),

    // deterministic sequence packing: docs assigned IN ORDER to
    // consecutive 512-token bins per source via an exclusive prefix
    // sum (bin = excl_cum div budget — streaming first-fit; a bin may
    // overrun by at most one document's tail). One window per source
    // partition: the partition key IS the corpus stratification key,
    // so the shuffle is the mix's natural layout; a pathologically hot
    // source falls back to Aggregates.globalCumSum's two-pass offsets
    "c8_sequence_packing" -> ((s, dir) => {
      val budget = 512L
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("excum", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .withColumn("bin", expr(s"excum div $budget"))
        .drop("excum")
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
        .orderBy(col("source"), col("bin"))
    }),

    // pipeline-grade packing: c8's first-fit prefix-sum over OVERFLOW-
    // SPLIT units — long documents are first chunked into ≤128-token
    // pieces (t12's chunker, stride = chunk ⇒ non-overlapping), so a
    // 10k-token document spills across bins instead of blowing one bin
    // out; the pack then runs per source over (doc_id, chunk_idx)
    // order. The chunk step is pure scan-stage array math; the pack
    // adds exactly c8's one window shuffle — composing the two
    // operators costs no extra exchange
    "c9_packed_chunks" -> ((s, dir) => {
      val budget = 512L
      val cap = 128
      val units = Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          explode(TextOps.chunkTokens(col("text"), cap, cap)).as("ch"))
        .select(col("source"), col("doc_id"),
          col("ch.chunk_idx").as("chunk_idx"),
          col("ch.n_chunk_tokens").cast("long").as("n_tokens"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("doc_id"), col("chunk_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      units
        .withColumn("excum", sum(col("n_tokens")).over(w) - col("n_tokens"))
        .withColumn("bin", expr(s"excum div $budget"))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("n_tokens")).as("bin_tokens"))
        .orderBy(col("source"), col("bin"))
    })
  )

  private val bm25Terms = Seq("spark", "vector", "merge", "customer")

  private val mixQuotas = Map(
    "en" -> 60, "es" -> 20, "de" -> 15, "fr" -> 10, "zh" -> 15)

  private def langScoreSql(words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(toks, t -> list_contains($lst, t)))"
  }

  val oracles: Map[String, String] = Map(
    "c8_sequence_packing" ->
      """WITH t AS (SELECT source, doc_id,
        |    len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      x -> x <> '')) AS n_tokens
        |  FROM documents),
        |c AS (SELECT source, doc_id, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_tokens AS excum
        |  FROM t)
        |SELECT source, CAST(excum // 512 AS BIGINT) AS bin,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "c9_packed_chunks" ->
      """WITH tok AS (SELECT source, doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      t -> t <> '') AS toks
        |  FROM documents),
        |n AS (SELECT source, doc_id, len(toks) AS n FROM tok),
        |c AS (SELECT source, doc_id, n,
        |    CASE WHEN n <= 128 THEN 1
        |      ELSE 1 + (n - 128 + 127) // 128 END AS nc
        |  FROM n),
        |e AS (SELECT source, doc_id, n,
        |    unnest(range(nc)) AS chunk_idx FROM c),
        |u AS (SELECT source, doc_id, chunk_idx,
        |    greatest(least(128, n - chunk_idx * 128), 0) AS n_tokens
        |  FROM e),
        |cum AS (SELECT source, doc_id, chunk_idx, n_tokens,
        |    sum(n_tokens) OVER (PARTITION BY source
        |      ORDER BY doc_id, chunk_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_tokens AS excum
        |  FROM u)
        |SELECT source, CAST(excum // 512 AS BIGINT) AS bin,
        |  count(*) AS n_chunks, count(DISTINCT doc_id) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
        |FROM cum GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "t12_chunking" ->
      """WITH tok AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      t -> t <> '') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM tok),
        |c AS (SELECT doc_id, toks, n,
        |    CASE WHEN n <= 64 THEN 1 ELSE 1 + (n - 64 + 47) // 48 END AS nc
        |  FROM n),
        |e AS (SELECT doc_id, toks, n,
        |    unnest(range(nc)) AS chunk_idx FROM c)
        |SELECT doc_id, chunk_idx,
        |  md5(array_to_string(
        |    list_slice(toks, chunk_idx * 48 + 1, chunk_idx * 48 + 64), ' '))
        |    AS chunk_fp,
        |  greatest(least(64, n - chunk_idx * 48), 0) AS n_chunk_tokens
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,

    "t11_pii_scrub" ->
      """WITH aug AS (SELECT doc_id,
        |    text || ' contact u' || CAST(doc_id AS VARCHAR) ||
        |      '@ex.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
        |      '.7 card 4111111111111111 tel +33 1 2345 6789' AS a
        |  FROM documents),
        |s1 AS (SELECT doc_id,
        |    len(regexp_extract_all(a,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |    regexp_replace(a, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g') AS a FROM aug),
        |s2 AS (SELECT doc_id, n_email,
        |    len(regexp_extract_all(a,
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
        |    regexp_replace(a, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
        |      '<IP>', 'g') AS a FROM s1),
        |s3 AS (SELECT doc_id, n_email, n_ip,
        |    len(regexp_extract_all(a, '\b\d{13,19}\b')) AS n_card,
        |    regexp_replace(a, '\b\d{13,19}\b', '<CARD>', 'g') AS a FROM s2),
        |s4 AS (SELECT doc_id, n_email, n_ip, n_card,
        |    len(regexp_extract_all(a,
        |      '\+\d{1,3}[ .-]?\d{2,4}[ .-]?\d{3,4}[ .-]?\d{3,4}\b')) AS n_phone,
        |    regexp_replace(a, '\+\d{1,3}[ .-]?\d{2,4}[ .-]?\d{3,4}[ .-]?\d{3,4}\b',
        |      '<PHONE>', 'g') AS a FROM s3)
        |SELECT doc_id, n_email, n_ip, n_card, n_phone, md5(a) AS scrub_fp
        |FROM s4 ORDER BY doc_id""".stripMargin,

    "t1_token_count" ->
      """SELECT doc_id,
        |  len(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS n_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpeish,
        |  length(text) AS n_chars_computed
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t2_quality" ->
      (s"""WITH t AS (SELECT doc_id, text,
        |  list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS DOUBLE)
        |    / length(text) AS punct_ratio,
        |  CAST(len(list_filter(toks, t -> list_contains($stopwordsSqlList, t))) AS DOUBLE)
        |    / len(toks) AS stopword_ratio,
        |  CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
        |    / len(toks) AS mean_word_len
        |FROM t ORDER BY doc_id""").stripMargin,

    "t10_normalize" ->
      """WITH tok AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, toks,
        |    list_filter(toks, x -> NOT (regexp_matches(x, '^https?://')
        |      OR regexp_matches(x, '^www\.')
        |      OR regexp_matches(x, '^[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}$'))) AS scrubbed
        |  FROM tok),
        |c AS (SELECT doc_id, toks,
        |    list_filter(scrubbed, (x, i) -> i = 1 OR x != scrubbed[i-1]) AS clean_toks
        |  FROM s)
        |SELECT doc_id, array_to_string(clean_toks[1:64], ' ') AS clean,
        |  len(toks) AS n_tokens, len(clean_toks) AS n_clean
        |FROM c ORDER BY doc_id""".stripMargin,

    "t3_langid" ->
      (s"""WITH t AS (SELECT doc_id, lang,
        |  list_filter(regexp_split_to_array(lower(text), '\\s+'), t -> t <> '') AS toks
        |  FROM documents),
        |sc AS (SELECT doc_id, lang,
        |  ${langScoreSql(TextOps.langProfiles(0)._2)} AS s_de,
        |  ${langScoreSql(TextOps.langProfiles(1)._2)} AS s_en,
        |  ${langScoreSql(TextOps.langProfiles(2)._2)} AS s_es,
        |  ${langScoreSql(TextOps.langProfiles(3)._2)} AS s_fr
        |  FROM t)
        |SELECT doc_id, lang AS lang_declared,
        |  CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
        |    WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
        |    WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
        |    WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
        |    ELSE 'fr' END AS lang_detected
        |FROM sc ORDER BY doc_id""").stripMargin,

    "t4_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t5_gopher_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, text, toks,
        |    CASE WHEN len(toks) >= 2
        |      THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |      ELSE [] END AS grams,
        |    list_filter(list_transform(string_split_regex(text, '\n'), l -> trim(l)), l -> l <> '') AS lns
        |  FROM t),
        |m AS (SELECT doc_id, text, toks, grams, lns,
        |    CASE WHEN len(grams) > 0 THEN
        |      list_max(list_transform(list_distinct(grams), x -> len(list_filter(grams, y -> y = x))))
        |      ELSE 0 END AS maxcnt,
        |    CAST((length(text) - length(replace(text, '#', ''))) +
        |      (length(text) - length(replace(text, '...', ''))) / 3 AS DOUBLE) AS symbols,
        |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) AS alphas,
        |    CAST(len(list_filter(lns, x -> len(list_filter(lns, y -> y = x)) > 1)) AS DOUBLE) AS duplines
        |  FROM g),
        |f AS (SELECT doc_id, text, toks, grams, lns, maxcnt,
        |    CASE WHEN len(grams) > 0 THEN maxcnt * length(list_max(list_filter(list_distinct(grams),
        |        x -> len(list_filter(grams, y -> y = x)) = maxcnt))) * 1.0 / length(text)
        |      ELSE 0.0 END AS top2gram_char_frac,
        |    CASE WHEN len(grams) > 0 THEN
        |        CAST(COALESCE(list_sum(list_transform(list_filter(list_distinct(grams),
        |          x -> len(list_filter(grams, y -> y = x)) > 1),
        |          x -> len(list_filter(grams, y -> y = x)) * length(x))), 0) AS DOUBLE) / length(text)
        |      ELSE 0.0 END AS dup2gram_char_frac,
        |    CASE WHEN len(toks) > 0 THEN symbols / len(toks) ELSE 0.0 END AS symbol_word_ratio,
        |    CASE WHEN len(toks) > 0 THEN alphas / len(toks) ELSE 0.0 END AS alpha_word_frac,
        |    CASE WHEN len(lns) > 0 THEN duplines / len(lns) ELSE 0.0 END AS dup_line_frac
        |  FROM m)
        |SELECT doc_id, top2gram_char_frac, dup2gram_char_frac, symbol_word_ratio,
        |  alpha_word_frac, dup_line_frac,
        |  ((len(toks) BETWEEN 50 AND 100000)
        |    AND (CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) BETWEEN 3.0 AND 10.0)
        |    AND symbol_word_ratio < 0.1 AND alpha_word_frac > 0.8
        |    AND top2gram_char_frac < 0.2 AND dup_line_frac < 0.3) AS gopher_pass
        |FROM f ORDER BY doc_id""".stripMargin,

    "t6_bm25" -> {
      val score = bm25Terms.indices.map(i =>
        s"""ln(1 + (n_docs - df_$i + 0.5) / (df_$i + 0.5)) * tf_$i * (1.2 + 1)
           |    / (tf_$i + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))""".stripMargin)
        .mkString(" +\n    ")
      s"""WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |p AS (SELECT doc_id, len(toks) AS dl,
        |    ${bm25Terms.zipWithIndex.map { case (t, i) =>
              s"len(list_filter(toks, x -> x = '$t')) AS tf_$i" }
              .mkString(",\n    ")}
        |  FROM t),
        |s AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl,
        |    ${bm25Terms.indices.map(i =>
              s"sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i")
              .mkString(",\n    ")}
        |  FROM p)
        |SELECT doc_id, round($score, 6) AS score
        |FROM p, s
        |ORDER BY $score DESC, doc_id
        |LIMIT 25""".stripMargin
    },

    "t8_heavy_hitters" ->
      """WITH tok AS (SELECT unnest(list_filter(
        |    regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*) AS n FROM tok GROUP BY 1),
        |t AS (SELECT sum(n) AS total FROM c)
        |SELECT token, n FROM c, t WHERE n > total * 0.02
        |ORDER BY token""".stripMargin,

    "c3_token_budget" ->
      (s"""WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |q AS (SELECT doc_id, len(toks) AS n_tokens,
        |    CAST(len(list_filter(toks, t -> list_contains($stopwordsSqlList, t))) AS DOUBLE)
        |      / len(toks) AS quality
        |  FROM t),
        |c AS (SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM q)
        |SELECT doc_id, n_tokens, cum_tokens FROM c
        |WHERE cum_tokens <= 10000 ORDER BY doc_id""").stripMargin,

    "t9_lm_nll" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |bi AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |    THEN list_transform(range(1, len(toks)), i -> struct_pack(w1 := toks[i], bg := toks[i] || ' ' || toks[i+1]))
        |    ELSE [] END) AS b
        |  FROM t),
        |f AS (SELECT doc_id, b.w1 AS w1, b.bg AS bg FROM bi),
        |cb AS (SELECT bg, count(*) AS cb FROM f GROUP BY 1),
        |u AS (SELECT unnest(toks) AS w1 FROM t),
        |cu AS (SELECT w1, count(*) AS cu FROM u GROUP BY 1),
        |v AS (SELECT count(*) AS v FROM cu)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(-CAST(sum(CAST(round(ln((cb + 1.0) / (cu + 1.0 * v)), 9) AS DECIMAL(20,9))) AS DOUBLE) / count(*), 6) AS nll
        |FROM f JOIN cb USING (bg) JOIN cu USING (w1) CROSS JOIN v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // replays the engine's determinism recipe bit-for-bit: sqrt
    // (IEEE-correctly-rounded in both engines) rounded to 9 decimals,
    // exact decimal sum, fractions floored to basis points, then the
    // FIXED 3-pass water-fill (Sketches.WaterFillPasses) unrolled as
    // chained CTEs — passes are idempotent once no new stratum
    // saturates, so the unroll equals the engine's early-exit loop
    "c6_temperature_mix" ->
      """WITH cnt AS (SELECT lang AS s, count(*) AS n FROM documents
        |  WHERE lang IS NOT NULL GROUP BY 1),
        |w AS (SELECT s, n, CAST(round(sqrt(n), 9) AS DECIMAL(20,9)) AS w FROM cnt),
        |t1 AS (SELECT CAST(sum(w) AS DOUBLE) AS wsum, CAST(150 AS BIGINT) AS rem FROM w),
        |r1 AS (SELECT s, n, w,
        |    CAST(floor(10000.0 * rem * CAST(w AS DOUBLE) / wsum / n) AS BIGINT) AS b
        |  FROM w, t1),
        |t2 AS (SELECT CAST(sum(CASE WHEN b < 10000 THEN w END) AS DOUBLE) AS wsum,
        |    150 - COALESCE(sum(CASE WHEN b >= 10000 THEN n END), 0) AS rem FROM r1),
        |r2 AS (SELECT s, n, w, b >= 10000 AS sat,
        |    CASE WHEN b >= 10000 THEN CAST(10000 AS BIGINT)
        |      ELSE CAST(floor(10000.0 * t2.rem * CAST(w AS DOUBLE) / t2.wsum / n) AS BIGINT) END AS b2
        |  FROM r1, t2),
        |t3 AS (SELECT CAST(sum(CASE WHEN NOT sat AND b2 < 10000 THEN w END) AS DOUBLE) AS wsum,
        |    150 - COALESCE(sum(CASE WHEN sat OR b2 >= 10000 THEN n END), 0) AS rem FROM r2),
        |bps AS (SELECT s,
        |    CASE WHEN sat OR b2 >= 10000 THEN CAST(10000 AS BIGINT)
        |      ELSE GREATEST(0, LEAST(10000,
        |        CAST(floor(10000.0 * t3.rem * CAST(w AS DOUBLE) / t3.wsum / n) AS BIGINT))) END AS b
        |  FROM r2, t3)
        |SELECT d.doc_id, d.lang FROM documents d JOIN bps ON d.lang = bps.s
        |WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < bps.b
        |ORDER BY d.doc_id""".stripMargin,

    "c5_ccnet_buckets" ->
      (s"""WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |sc AS (SELECT doc_id,
        |  ${langScoreSql(TextOps.langProfiles(0)._2)} AS s_de,
        |  ${langScoreSql(TextOps.langProfiles(1)._2)} AS s_en,
        |  ${langScoreSql(TextOps.langProfiles(2)._2)} AS s_es,
        |  ${langScoreSql(TextOps.langProfiles(3)._2)} AS s_fr
        |  FROM t),
        |lang AS (SELECT doc_id,
        |  CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'unknown'
        |    WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
        |    WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
        |    WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
        |    ELSE 'fr' END AS lang_detected
        |  FROM sc),
        |bi AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |    THEN list_transform(range(1, len(toks)), i -> struct_pack(w1 := toks[i], bg := toks[i] || ' ' || toks[i+1]))
        |    ELSE [] END) AS b
        |  FROM t),
        |f AS (SELECT doc_id, b.w1 AS w1, b.bg AS bg FROM bi),
        |cb AS (SELECT bg, count(*) AS cb FROM f GROUP BY 1),
        |u AS (SELECT unnest(toks) AS w1 FROM t),
        |cu AS (SELECT w1, count(*) AS cu FROM u GROUP BY 1),
        |v AS (SELECT count(*) AS v FROM cu),
        |nll AS (SELECT doc_id,
        |    round(-CAST(sum(CAST(round(ln((cb + 1.0) / (cu + 1.0 * v)), 9) AS DECIMAL(20,9))) AS DOUBLE) / count(*), 6) AS nll
        |  FROM f JOIN cb USING (bg) JOIN cu USING (w1) CROSS JOIN v
        |  GROUP BY doc_id),
        |r AS (SELECT n.doc_id, l.lang_detected, n.nll,
        |    ntile(3) OVER (PARTITION BY l.lang_detected ORDER BY n.nll, n.doc_id) AS bucket
        |  FROM nll n JOIN lang l ON n.doc_id = l.doc_id)
        |SELECT doc_id, lang_detected, bucket, nll FROM r
        |WHERE bucket <= 2 ORDER BY doc_id""").stripMargin,

    "c4_domain_mix" -> {
      val quotaCase = mixQuotas.toSeq.sortBy(_._1).map { case (l, q) =>
        s"WHEN '$l' THEN $q" }.mkString(" ")
      s"""WITH t AS (SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |q AS (SELECT doc_id, lang,
        |    CAST(len(list_filter(toks, t -> list_contains($stopwordsSqlList, t))) AS DOUBLE)
        |      / len(toks) AS quality
        |  FROM t),
        |r AS (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS stratum_rank
        |  FROM q)
        |SELECT doc_id, lang, stratum_rank FROM r
        |WHERE stratum_rank <= CASE lang $quotaCase ELSE 0 END
        |ORDER BY doc_id""".stripMargin
    },

    "t7_decontaminate" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 4
        |    THEN list_transform(range(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
        |    ELSE [] END)) AS s
        |  FROM t),
        |bg AS (SELECT DISTINCT s FROM g WHERE doc_id % 50 = 0),
        |hits AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (s))
        |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS is_contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // identical relational semantics to t7 — the bloom prefilter is a
    // lossy-then-verified physical optimization, invisible to the
    // result, so the oracle replays the same exact semi-join
    "t13_bloom_decontaminate" ->
      """WITH t AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 4
        |    THEN list_transform(range(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
        |    ELSE [] END)) AS s
        |  FROM t),
        |bg AS (SELECT DISTINCT s FROM g WHERE doc_id % 50 = 0),
        |hits AS (SELECT DISTINCT g.doc_id FROM g JOIN bg USING (s))
        |SELECT d.doc_id, (h.doc_id IS NOT NULL) AS is_contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        |ORDER BY d.doc_id""".stripMargin
  )
}
