package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines
  * (beyond the reference surface — BASELINE.json north star): token
  * counting, quality scoring, language id, fingerprinting.
  *
  * Everything is a pure `Column` expression (whole-stage codegen, no
  * UDFs) — at 100 TB these run inside the parquet scan stage with zero
  * shuffles.
  */
object TextOps {

  /** Lowercased whitespace tokens, empty strings removed. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric marks — a cheap proxy for subword tokenizer load
    * (ASCII classes only, so every engine's regex agrees). */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Punctuation ratio over character length (quality signal). */
  def punctRatio(c: Column): Column = {
    val stripped = regexp_replace(c, "[.,;:!?]", "")
    (length(c) - length(stripped)).cast(DoubleType) / length(c)
  }

  /** Fraction of tokens that are stopwords (quality signal). */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(c)
    val sw = typedLit(stopwords)
    size(filter(toks, t => array_contains(sw, t))).cast(DoubleType) /
      size(toks)
  }

  /** Mean token length in characters. */
  def meanWordLen(c: Column): Column = {
    val toks = tokens(c)
    aggregate(transform(toks, t => length(t)), lit(0),
      (acc, x) => acc + x).cast(DoubleType) / size(toks)
  }

  /** Whitespace-normalized lowercase form used for fingerprinting. */
  def normalize(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Exact document fingerprint: md5 of the normalized text. */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Rolling polynomial hash over token k-grams, winnowing-style: the
    * minimum k-gram hash is a locality-robust document fingerprint
    * (same idea as MOSS winnowing, one window). */
  def minKgramHash(c: Column, k: Int = 3): Column = {
    val sh = Dedup.shingles(c, k)
    when(size(sh) > 0, array_min(transform(sh, s => xxhash64(s))))
  }

  /** Per-language marker-word profiles for the n-gram/stopword
    * language-id heuristic. Order matters: ties resolve to the first
    * language in this list (deterministic). */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "das", "ein", "nicht", "ist", "zu"),
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "los", "que", "y", "en", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "du"))

  /** Language id: count marker-word hits per profile, pick the first
    * language reaching the maximum; 'unknown' when no marker hits. */
  def langId(c: Column): Column = {
    val toks = tokens(c)
    val scores = langProfiles.map { case (lang, words) =>
      lang -> size(filter(toks, t => array_contains(typedLit(words), t)))
    }
    val maxScore = greatest(scores.map(_._2): _*)
    val chain = scores.foldRight(lit("unknown")) { case ((lang, sc), els) =>
      when(sc === maxScore, lit(lang)).otherwise(els)
    }
    when(maxScore === 0, lit("unknown")).otherwise(chain)
  }

  /** Composite quality score in [0,1]: rewards moderate length,
    * punctuation presence, and a sane stopword share. Deterministic
    * column math — thresholds are heuristic. */
  def qualityScore(c: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(c).cast(DoubleType) / 500.0, lit(1.0))
    val punct = punctRatio(c)
    val punctScore = when(punct > 0.2, 0.0).otherwise(lit(1.0) - punct / 0.2)
    val sw = stopwordRatio(c, stopwords)
    val swScore = lit(1.0) - abs(sw - 0.4) / 0.6
    (lenScore + punctScore + greatest(swScore, lit(0.0))) / 3.0
  }
}
