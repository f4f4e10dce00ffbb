package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.ColumnOps.exactSum2
import graft.operators.AsOfJoin

/** Harness queries for the reference's join surface (SURVEY.md §2.3
  * J1-J8). Small dimensions are broadcast explicitly — at 100 TB the
  * dimension tables (nation, region, supplier) stay broadcast-able while
  * the fact tables shuffle only when semantically required.
  */
object JoinQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1: multi-hop equi-join chain (reference join_datasets.py:174-181).
    // nation/region are tiny → broadcast; no shuffle on the fact side
    // until the aggregation.
    "j1_equi_chain" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val c = Tables(s, dir, "customer")
      val n = Tables(s, dir, "nation")
      val r = Tables(s, dir, "region")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(exactSum2(col("o_totalprice")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // J2: full-outer join of two aggregates on common keys
    // (reference tva_dataset.py:59-64)
    "j2_full_outer" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val open = o.filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_open"))
      val done = o.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_done"))
      open.join(done, Seq("o_custkey"), "outer")
        .orderBy(col("o_custkey"))
    }),

    // J3: left-semi membership filter (reference join_datasets.py:168-171
    // workforce mask)
    "j3_semi" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val big = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 150000).select(col("o_custkey"))
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // J4: theta/range semi-join — keep rows whose date falls inside a
    // per-entity activity window (reference join_datasets.py:202-210)
    "j4_theta_semi" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val windows = o.groupBy(col("o_custkey").as("w_custkey"))
        .agg(add_months(min(col("o_orderdate")).cast(DateType), 3).as("w_start"),
          max(col("o_orderdate")).cast(DateType).as("w_end"))
      o.join(windows,
          o("o_custkey") === windows("w_custkey")
            && o("o_orderdate").cast(DateType) >= windows("w_start")
            && o("o_orderdate").cast(DateType) < windows("w_end"),
          "left_semi")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // J5: interval → dense monthly rows via sequence+explode — no
    // cross-range join against a spine (reference
    // extract_financial_DGFiP.py:206-212 does the join; explode is the
    // shuffle-free scale path)
    "j5_interval_explode" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val spans = li.groupBy(col("l_suppkey"))
        .agg(date_trunc("month", min(col("l_shipdate"))).cast(DateType).as("d0"),
          date_trunc("month", max(col("l_shipdate"))).cast(DateType).as("d1"))
      graft.operators.TimeOps.explodeInterval(spans, "d0", "d1", "mois")
        .select(col("l_suppkey"), col("mois"))
        .orderBy(col("l_suppkey"), col("mois"))
    }),

    // J6/W10: as-of backward join with tolerance (reference merge_asof,
    // utils.py:101-241) — monthly panel enriched with the most recent
    // large-order snapshot per customer, ≤ 92 days old.
    "j6_asof_backward" -> ((s, dir) => asofQuery(s, dir, "backward")),

    // J6b: forward direction
    "j6_asof_forward" -> ((s, dir) => asofQuery(s, dir, "forward")),

    // J6c: the same backward as-of join through the NATIVE Catalyst
    // operator (custom LogicalPlan → strategy → whole-stage-codegen'd
    // sort-merge exec) — same oracle, different physical plan: the
    // co-partitioned input shape collapses everything after one
    // entity-key shuffle into a single codegen stage
    "j6_asof_native" -> ((s, dir) =>
      asofQuery(s, dir, "backward", AsOfJoin.mergeAsOfNative,
        coPartition = true)),

    // J7: self-join on aggregate → expressed as a window sum
    // (reference rar_dataset.py:147-153)
    "j7_selfjoin_agg" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val w = Window.partitionBy(col("l_orderkey"))
      li.withColumn("order_total",
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).over(w)
            .cast(DoubleType))
        .withColumn("line_share",
          col("l_extendedprice") / col("order_total"))
        .select(col("l_orderkey"), col("l_linenumber"), col("order_total"),
          col("line_share"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Anti-join (beyond reference — completes the membership family):
    // customers with no large order. The >300000 filter keeps the result
    // non-empty at every scale factor (an anti-join against ALL orders is
    // vacuously empty in this data), so the gate exercises real anti-join
    // semantics.
    "j8_anti" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val o = Tables(s, dir, "orders")
        .filter(col("o_totalprice") > 300000).select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    })
  )

  /** Monthly spine per customer (left) as-of joined against deduplicated
    * large-order snapshots (right). */
  private def asofQuery(s: SparkSession, dir: String,
      direction: String,
      impl: (DataFrame, DataFrame, String, Seq[String], Option[Int],
        String) => DataFrame = AsOfJoin.mergeAsOf,
      coPartition: Boolean = false): DataFrame = {
    // coPartition = the NATIVE operator's intended input shape: one
    // explicit repartition on the entity key makes hash(custkey)
    // satisfy both aggregates' ClusteredDistribution((custkey, x)) AND
    // the as-of exec's ClusteredDistribution(custkey), so the final
    // aggs, both sorts, and the merge fuse into ONE codegen stage with
    // ZERO as-of exchanges (plan-gated in ScaleSpec). The union-tag
    // window form cannot express this — union discards partitioning —
    // which is exactly the structural reason the native operator
    // exists.
    val o0 = Tables(s, dir, "orders")
    val o = if (coPartition)
      o0.select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        .repartition(col("o_custkey"))
    else o0
    val panel = o.groupBy(col("o_custkey").as("custkey"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("mois"))
      .agg(count(lit(1)).as("n_orders"))
    // right side: one snapshot per (custkey, date) — exact-decimal max
    val snaps = o.filter(col("o_totalprice") > 100000)
      .groupBy(col("o_custkey").as("custkey"),
        col("o_orderdate").cast(DateType).as("snap_date"))
      .agg(max(col("o_totalprice")).as("snap_price"))
    val left = panel.withColumn("d", col("mois"))
    val right = snaps.withColumn("d", col("snap_date")).drop("snap_date")
    impl(left, right, "d", Seq("custkey"), Some(92), direction)
      .select(col("custkey"), col("mois"), col("n_orders"), col("snap_price"))
      .orderBy(col("custkey"), col("mois"))
  }

  val oracles: Map[String, String] = Map(
    "j1_equi_chain" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "j2_full_outer" ->
      """SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey, n_open, n_done
        |FROM (SELECT o_custkey, count(*) AS n_open FROM orders
        |      WHERE o_orderstatus = 'O' GROUP BY 1) a
        |FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_done FROM orders
        |      WHERE o_orderstatus = 'F' GROUP BY 1) b
        |USING (o_custkey)
        |ORDER BY o_custkey""".stripMargin,

    "j3_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 150000)
        |ORDER BY c_custkey""".stripMargin,

    "j4_theta_semi" ->
      """WITH w AS (
        |  SELECT o_custkey,
        |    CAST(CAST(min(o_orderdate) AS DATE) + INTERVAL 3 MONTH AS DATE) AS w_start,
        |    CAST(max(o_orderdate) AS DATE) AS w_end
        |  FROM orders GROUP BY 1)
        |SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE EXISTS (SELECT 1 FROM w
        |  WHERE w.o_custkey = o.o_custkey
        |    AND CAST(o.o_orderdate AS DATE) >= w.w_start
        |    AND CAST(o.o_orderdate AS DATE) < w.w_end)
        |ORDER BY o_orderkey""".stripMargin,

    "j5_interval_explode" ->
      """WITH spans AS (
        |  SELECT l_suppkey,
        |    CAST(date_trunc('month', min(l_shipdate)) AS DATE) AS d0,
        |    CAST(date_trunc('month', max(l_shipdate)) AS DATE) AS d1
        |  FROM lineitem GROUP BY 1)
        |SELECT l_suppkey,
        |  CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |    CAST(d1 AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS mois
        |FROM spans ORDER BY l_suppkey, mois""".stripMargin,

    "j6_asof_backward" ->
      """WITH panel AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS mois,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |snaps AS (
        |  SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS snap_date,
        |    max(o_totalprice) AS snap_price
        |  FROM orders WHERE o_totalprice > 100000 GROUP BY 1, 2)
        |SELECT p.custkey, p.mois, p.n_orders,
        |  CASE WHEN s.snap_date IS NOT NULL
        |    AND datediff('day', s.snap_date, p.mois) <= 92
        |    THEN s.snap_price END AS snap_price
        |FROM panel p
        |ASOF LEFT JOIN snaps s
        |  ON p.custkey = s.custkey AND p.mois >= s.snap_date
        |ORDER BY p.custkey, p.mois""".stripMargin,

    "j6_asof_native" ->
      """WITH panel AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS mois,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |snaps AS (
        |  SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS snap_date,
        |    max(o_totalprice) AS snap_price
        |  FROM orders WHERE o_totalprice > 100000 GROUP BY 1, 2)
        |SELECT p.custkey, p.mois, p.n_orders,
        |  CASE WHEN s.snap_date IS NOT NULL
        |    AND datediff('day', s.snap_date, p.mois) <= 92
        |    THEN s.snap_price END AS snap_price
        |FROM panel p
        |ASOF LEFT JOIN snaps s
        |  ON p.custkey = s.custkey AND p.mois >= s.snap_date
        |ORDER BY p.custkey, p.mois""".stripMargin,

    "j6_asof_forward" ->
      """WITH panel AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS mois,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |snaps AS (
        |  SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS snap_date,
        |    max(o_totalprice) AS snap_price
        |  FROM orders WHERE o_totalprice > 100000 GROUP BY 1, 2)
        |SELECT p.custkey, p.mois, p.n_orders,
        |  CASE WHEN s.snap_date IS NOT NULL
        |    AND datediff('day', p.mois, s.snap_date) <= 92
        |    THEN s.snap_price END AS snap_price
        |FROM panel p
        |ASOF LEFT JOIN snaps s
        |  ON p.custkey = s.custkey AND p.mois <= s.snap_date
        |ORDER BY p.custkey, p.mois""".stripMargin,

    "j7_selfjoin_agg" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_orderkey) AS DOUBLE) AS order_total,
        |  l_extendedprice / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY l_orderkey) AS DOUBLE) AS line_share
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "j8_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin
  )
}
