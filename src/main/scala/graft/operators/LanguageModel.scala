package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Barrier.BarrierOps
import org.apache.spark.sql.types._

/** Statistical language-model scoring for corpus curation (the CCNet
  * shape, Wenzek et al. 2020: score every document with an n-gram LM
  * and filter/segment the corpus by perplexity; here the LM is fit on
  * the corpus itself, the self-scoring variant used for in-corpus
  * outlier detection).
  *
  * Scale design: the model is two count tables (unigrams, bigrams)
  * built by map-side-combinable aggregates over exploded tokens; they
  * are VOCABULARY-sized, not corpus-sized, but can still be large at
  * 100 TB — scoring re-attaches them with ordinary shuffle equi-joins
  * keyed on the n-gram (never a driver collect or a blind broadcast).
  * The corpus-level constant (vocabulary size) is a driver scalar
  * reduced from the materialized unigram aggregate and inlined as a
  * literal — never an unpartitioned window (one task holding the whole
  * vocab) and never a cross join (= BroadcastNestedLoop plan); the
  * same pattern as Sketches.heavyHitters.
  */
object LanguageModel {

  /** Per-document mean negative log-likelihood under an add-alpha
    * smoothed bigram model fit on `df` itself:
    *
    *   P(w2 | w1) = (c(w1 w2) + alpha) / (c(w1) + alpha * V)
    *
    * with c(.) corpus counts and V the unigram vocabulary size. Output
    * (doc_id, n_bigrams, nll): nll = -mean ln P, lower = more typical
    * of the corpus, higher = outlier (the CCNet head/tail signal).
    * Documents with fewer than 2 tokens have no bigrams and are absent.
    *
    * Cross-engine float determinism: each ln term is rounded to 9
    * decimals and summed as DECIMAL (exact, order-insensitive); the
    * mean is rounded to 6 decimals — same recipe as the BM25 oracle.
    */
  def bigramNll(df: DataFrame, idCol: String, textCol: String,
      alpha: Double = 1.0): DataFrame = {
    val toks = df.select(col(idCol).cast(LongType).as("doc_id"),
      TextOps.tokens(col(textCol)).as("__toks"))
    // The unigram table is materialized ONCE (eager localCheckpoint);
    // the vocabulary size V = its row count reduces to a driver scalar
    // from the checkpoint (never re-running the corpus explode) and
    // rides into the scoring expression as a literal — no unpartitioned
    // window (one task holding a web-scale vocab), no cross join.
    val unigramCounts = toks.select(explode(col("__toks")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("cu"))
      .barrier()
    val unigrams = unigramCounts.withColumn("v", lit(unigramCounts.count()))
    val docBigrams = toks
      .select(col("doc_id"),
        explode(Dedup.shinglesOfTokens(col("__toks"), 2)).as("bg"))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
    // corpus bigram counts via a bg-partitioned WINDOW instead of a
    // groupBy + self-join (r18): the join form plans docBigrams TWICE
    // (once under the count aggregate, once as the probe side), so the
    // corpus-sized explode ran twice per execution; the window computes
    // the identical per-bigram count in ONE pass over one explode. At
    // scale the join form's probe side is shuffled (or sorted for SMJ)
    // by bg anyway, so the window's bg-shuffle+sort is the same bytes
    // moved once instead of twice. Counts are integers and the NLL sum
    // is decimal — order-independent, so results are bit-identical
    // (oracle re-certified).
    docBigrams
      .withColumn("cb", count(lit(1)).over(org.apache.spark.sql
        .expressions.Window.partitionBy(col("bg"))))
      .join(unigrams, "w1")
      .withColumn("lnp",
        round(log((col("cb") + alpha) / (col("cu") + col("v") * alpha)), 9)
          .cast(DecimalType(20, 9)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lnp")).as("__s"))
      .select(col("doc_id"), col("n_bigrams"),
        round(-col("__s").cast(DoubleType) / col("n_bigrams"), 6).as("nll"))
  }
}
