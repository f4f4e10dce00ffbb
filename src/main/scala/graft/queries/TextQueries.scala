package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.TextOps

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

    // document fingerprinting: md5 of whitespace-normalized text
    "t4_fingerprint" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), TextOps.fingerprint(col("text")).as("fp"))
        .orderBy(col("doc_id"))
    })
  )

  private def langScoreSql(words: Seq[String]): String = {
    val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter(toks, t -> list_contains($lst, t)))"
  }

  val oracles: Map[String, String] = Map(
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
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
