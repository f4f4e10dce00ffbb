package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graph

/** Graph-analytics harness queries (quantized PageRank; near-dup
  * clustering's connected components live with the dedup family). */
object GraphQueries {

  /** Undirected supplier↔customer bipartite edges induced by orders:
    * an edge per distinct (supplier, customer) trading pair, emitted
    * in both directions. */
  private def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("s"), col("l_suppkey")).as("s"),
        concat(lit("c"), col("o_custkey")).as("c"))
      .distinct()
    pairs.select(col("s").as("src"), col("c").as("dst"))
      .union(pairs.select(col("c").as("src"), col("s").as("dst")))
      .distinct()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // G1: 3-iteration quantized PageRank over the trading graph —
    // integer 1e-6-unit ranks make the recurrence exact across
    // engines (float PageRank sums are order-dependent; see
    // operators/Graph.scala), so the oracle replays all three
    // iterations as unrolled CTEs bit-for-bit
    "g1_pagerank" -> ((s, dir) => {
      Graph.pageRankQuantized(tradeEdges(s, dir), iterations = 3)
        .orderBy(col("node"))
    }),

    // G2: BFS levels — minimum hop distance from supplier s1 over the
    // trading graph, 3 hops (s1 → its customers → their other
    // suppliers → those suppliers' customers); frontier-join dataflow,
    // oracled by unrolled per-hop CTEs taking the min level
    "g2_bfs" -> ((s, dir) => {
      import s.implicits._
      Graph.bfsLevels(tradeEdges(s, dir),
          Seq("s1").toDF("node"), maxHops = 3)
        .orderBy(col("level"), col("node"))
    })
  )

  val oracles: Map[String, String] = Map(
    "g1_pagerank" ->
      """WITH pairs AS (SELECT DISTINCT 's' || l_suppkey AS s,
        |    'c' || o_custkey AS c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT s AS src, c AS dst FROM pairs
        |  UNION SELECT c AS src, s AS dst FROM pairs),
        |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
        |nodes AS (SELECT DISTINCT src AS node FROM edges
        |  UNION SELECT DISTINCT dst AS node FROM edges),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank_units FROM nodes),
        |i1 AS (SELECT e.dst AS node, sum(r.rank_units // d.outdeg) AS inflow
        |  FROM edges e JOIN r0 r ON e.src = r.node
        |  JOIN deg d ON e.src = d.src GROUP BY 1),
        |r1 AS (SELECT n.node,
        |    150000 + (8500 * coalesce(i.inflow, 0)) // 10000 AS rank_units
        |  FROM nodes n LEFT JOIN i1 i USING (node)),
        |i2 AS (SELECT e.dst AS node, sum(r.rank_units // d.outdeg) AS inflow
        |  FROM edges e JOIN r1 r ON e.src = r.node
        |  JOIN deg d ON e.src = d.src GROUP BY 1),
        |r2 AS (SELECT n.node,
        |    150000 + (8500 * coalesce(i.inflow, 0)) // 10000 AS rank_units
        |  FROM nodes n LEFT JOIN i2 i USING (node)),
        |i3 AS (SELECT e.dst AS node, sum(r.rank_units // d.outdeg) AS inflow
        |  FROM edges e JOIN r2 r ON e.src = r.node
        |  JOIN deg d ON e.src = d.src GROUP BY 1),
        |r3 AS (SELECT n.node,
        |    150000 + (8500 * coalesce(i.inflow, 0)) // 10000 AS rank_units
        |  FROM nodes n LEFT JOIN i3 i USING (node))
        |SELECT node, CAST(rank_units AS BIGINT) AS rank_units
        |FROM r3 ORDER BY node""".stripMargin,

    "g2_bfs" ->
      """WITH pairs AS (SELECT DISTINCT 's' || l_suppkey AS s,
        |    'c' || o_custkey AS c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |edges AS (SELECT s AS src, c AS dst FROM pairs
        |  UNION SELECT c AS src, s AS dst FROM pairs),
        |l0 AS (SELECT 's1' AS node),
        |l1 AS (SELECT DISTINCT e.dst AS node FROM edges e
        |  JOIN l0 ON e.src = l0.node
        |  WHERE e.dst NOT IN (SELECT node FROM l0)),
        |l2 AS (SELECT DISTINCT e.dst AS node FROM edges e
        |  JOIN l1 ON e.src = l1.node
        |  WHERE e.dst NOT IN (SELECT node FROM l0)
        |    AND e.dst NOT IN (SELECT node FROM l1)),
        |l3 AS (SELECT DISTINCT e.dst AS node FROM edges e
        |  JOIN l2 ON e.src = l2.node
        |  WHERE e.dst NOT IN (SELECT node FROM l0)
        |    AND e.dst NOT IN (SELECT node FROM l1)
        |    AND e.dst NOT IN (SELECT node FROM l2))
        |SELECT node, 0 AS level FROM l0
        |UNION ALL SELECT node, 1 FROM l1
        |UNION ALL SELECT node, 2 FROM l2
        |UNION ALL SELECT node, 3 FROM l3
        |ORDER BY level, node""".stripMargin
  )
}
