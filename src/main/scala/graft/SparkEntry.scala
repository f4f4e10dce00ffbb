package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` aggregate the per-family modules under
  * graft.queries; each key is one operator from SURVEY.md §2 (or a
  * beyond-reference pipeline operator) with a DuckDB-checkable oracle.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (driver smoke-checks rows>0).
    *
    * Reproduces the reference's signature shape (SURVEY.md §7.2): monthly
    * panel assembly [A1] + dense spine [S4/J5] + as-of enrichment [J6] +
    * lag/diff/moving-average time-series features [W1-W3] + ffill [W4] +
    * binary target via add_months comparison [M11].
    */
  def entry(spark: SparkSession): DataFrame =
    queries("flagship_panel")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("flagship_panel" -> ((s: SparkSession, dir: String) =>
      graft.queries.WindowQueries.flagshipPanel(s, dir))) ++
      graft.queries.CoreQueries.queries ++
      graft.queries.JoinQueries.queries ++
      graft.queries.WindowQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.MLQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.StreamingQueries.queries

  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++
      graft.queries.JoinQueries.oracles ++
      graft.queries.WindowQueries.oracles ++
      graft.queries.TextQueries.oracles ++
      graft.queries.DedupQueries.oracles ++
      graft.queries.SimilarityQueries.oracles ++
      graft.queries.MLQueries.oracles ++
      graft.queries.EventQueries.oracles ++
      graft.queries.GraphQueries.oracles ++
      graft.queries.MultimodalQueries.oracles ++
      graft.queries.StreamingQueries.oracles
}
