package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ranked retrieval over a document corpus: BM25 scoring for a fixed
  * set of query terms (the classic Robertson/Spärck Jones Okapi BM25,
  * `idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`, defaults k1=1.2,
  * b=0.75).
  *
  * Scale design: per-document term frequencies and length are pure
  * Column expressions evaluated inside the scan stage; the corpus
  * statistics (N, avgdl, per-term df) reduce to ONE single-row
  * aggregate that is broadcast back via cross join. At 100 TB that is
  * one full scan, one 1-row broadcast, and a top-k sort — no per-term
  * shuffle, no driver collect.
  */
object Ranking {

  /** (id, score) for the `k` highest-BM25 documents, ties broken by id
    * ascending. `terms` should be lowercase single tokens. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int = 20, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK needs at least one query term")
    val perDoc = df
      .select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .select(col(idCol) +: size(col("toks")).as("dl") +:
        terms.indices.map(i =>
          size(filter(col("toks"), x => x === lit(terms(i))))
            .as(s"tf_$i")): _*)
    val statAggs: Seq[Column] =
      count(lit(1)).as("n_docs") +: avg(col("dl")).as("avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf_$i") > 0, 1).otherwise(0)).as(s"df_$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast(DoubleType)
      val dfT = col(s"df_$i").cast(DoubleType)
      val idf = log(lit(1) + (col("n_docs") - dfT + 0.5) / (dfT + 0.5))
      idf * tf * (k1 + 1) /
        (tf + lit(k1) * (lit(1) - b + lit(b) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .select(col(idCol), score.as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }
}
