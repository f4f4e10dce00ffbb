package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Similarity-search harness queries over the `embeddings` table.
  *
  * s1/s2 have DuckDB oracles built from the same explicit
  * dot/norm arithmetic (sequential fold over doubles in both engines).
  * s3 (LSH ANN) uses engine-side hashing — rows-only check + ScalaTest
  * recall assertion vs the brute-force baseline.
  */
object SimilarityQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // brute-force cosine top-5 for a fixed query subset
    "s1_bruteforce_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),

    // embedding cosine near-duplicate pairs, threshold 0.99
    "s2_cosine_neardup" -> ((s, dir) => {
      Similarity.cosineNearDupPairs(
          Tables(s, dir, "embeddings").filter(col("vec_id") < 300),
          "vec_id", "embedding", threshold = 0.99)
        .orderBy(col("i"), col("j"))
    }),

    // LSH-bucketed ANN top-5 (rows-only check; recall vs s1 in ScalaTest)
    "s3_lsh_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.lshTopK(emb, "vec_id", "embedding", dim = 64, k = 5,
          planes = 4, tables = 16)
        .filter(col("query_id") < 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF (k-means cells + nprobe) ANN top-5 (rows-only; recall in ScalaTest)
    "s4_ivf_topk" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      Similarity.ivfTopK(emb, "vec_id", "embedding", k = 5,
          nlist = 16, nprobe = 4)
        .filter(col("query_id") < 10)
        .orderBy(col("query_id"), col("rank"))
    })
  )

  // DuckDB cosine with the same sequential double fold:
  // list_dot_product on DOUBLE[] lists.
  private val cosSql =
    """list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
      |    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
      |       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))""".stripMargin

  val oracles: Map[String, String] = Map(
    "s1_bruteforce_topk" ->
      (s"""WITH scored AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS corpus_id,
        |    $cosSql AS cos
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
        |  WHERE a.vec_id < 10),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY cos DESC, corpus_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank, corpus_id, cos FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""").stripMargin,

    "s2_cosine_neardup" ->
      (s"""SELECT a.vec_id AS i, b.vec_id AS j, $cosSql AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE a.vec_id < 300 AND b.vec_id < 300
        |  AND $cosSql >= 0.99
        |ORDER BY i, j""").stripMargin
  )
}
