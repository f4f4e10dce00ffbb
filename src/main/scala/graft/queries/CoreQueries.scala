package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.ColumnOps.{clip, exactSum2, nullCount, padId, rowSum}

/** Harness queries for the reference's projection/filter/aggregate surface
  * (SURVEY.md §2.2 P1-P9, §2.4 A1-A10, §2.6-2.7 O/U) over the TPC-H-ish
  * testdata. Every query orders deterministically and keeps floating
  * aggregates exact (decimal-cast sums) so the DuckDB oracle hash-matches.
  */
object CoreQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1: named group-by aggregation (reference extract_cotisation_urssaf.py:108-112)
    "a1_agg_named" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          exactSum2(col("l_extendedprice")).as("sum_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P1+P2: projection + rename (reference extract_financial_DGFiP.py:129-160)
    "p1_project_rename" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
          col("c_mktsegment").as("segment"))
        .orderBy(col("custkey"))
    }),

    // P3: derived arithmetic columns (reference tva_dataset.py:66-234 ratios)
    "p3_derived" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .withColumn("net_price",
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .withColumn("charged",
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")))
        .select(col("l_orderkey"), col("l_linenumber"), col("net_price"),
          col("charged"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // P4: SQL-string predicate filter (reference transform.py:897-916
    // PrivateCompanyFilter "code_naf NOT IN ('O','P')")
    "p4_filter_sql" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .filter("o_orderstatus NOT IN ('F', 'P')")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // P5: Column predicates — isin / between / isNotNull
    // (reference extract_judgment_DGFiP_data.py:61-65, __main__.py:158-176)
    "p5_filter_cols" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .filter(col("l_returnflag").isin("A", "R")
          && col("l_quantity").between(10, 40)
          && col("l_shipdate").isNotNull)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // P6: conditional expressions — when/otherwise + clip
    // (reference utils.py:75-98, rar_dataset.py:195-200)
    "p6_conditional" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .withColumn("qty_clipped",
          clip(col("l_quantity"), Some(lit(5.0)), Some(lit(45.0))))
        .withColumn("bulk_flag",
          when(col("l_quantity") >= 30, lit(1)).otherwise(lit(0)))
        .select(col("l_orderkey"), col("l_linenumber"), col("qty_clipped"),
          col("bulk_flag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // P7: null handling — synthesize nulls with nullif, then na.fill +
    // per-row null counts (reference transform.py:244-247,349-355)
    "p7_null_fill" -> ((s, dir) => {
      val withNulls = Tables(s, dir, "customer")
        .withColumn("bal", when(col("c_acctbal") < 0, lit(null))
          .otherwise(col("c_acctbal")))
        .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING")))
      withNulls
        .withColumn("n_missing",
          nullCount(Seq(col("bal"), col("seg"))))
        .na.fill(Map("bal" -> 0.0, "seg" -> "UNKNOWN"))
        .select(col("c_custkey"), col("bal"), col("seg"), col("n_missing"))
        .orderBy(col("c_custkey"))
    }),

    // P8: distinct on a key subset (reference transform.py:534)
    "p8_distinct" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // P9 + id normalization: casts and zero-padded ids
    // (reference transform.py:365-418 IdentifierNormalizer)
    "p9_cast_pad" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .withColumn("custkey_str", padId(col("c_custkey"), 9))
        .withColumn("bal_int", col("c_acctbal").cast(IntegerType))
        .select(col("c_custkey"), col("custkey_str"), col("bal_int"))
        .orderBy(col("c_custkey"))
    }),

    // A2: map-form keyed aggregate with passthrough re-join
    // (reference SirenAggregator, transform.py:471-539)
    "a2_keyed_agg" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_returnflag"), col("l_quantity"),
          col("l_orderkey"))
      graft.operators.Aggregates.keyedAggregate(
          li.drop("l_orderkey"),
          Seq("l_suppkey", "l_returnflag"), Map("l_quantity" -> "sum"))
        .orderBy(col("l_suppkey"), col("l_returnflag"))
    }),

    // A3/A10: min/max aggregates and spans (reference join_datasets.py:169)
    "a3_minmax" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(min(col("o_orderdate")).cast(DateType).as("first_order"),
          max(col("o_orderdate")).cast(DateType).as("last_order"),
          max(col("o_totalprice")).as("max_price"))
        .orderBy(col("o_custkey"))
    }),

    // A4: latest snapshot per group via max_by
    // (reference altares_preprocessing.py:74-76 groupBy+last)
    "a4_grouped_last" -> ((s, dir) => {
      graft.operators.Aggregates.lastByGroup(
          Tables(s, dir, "orders"),
          Seq("o_custkey"), "o_orderkey",
          Seq("o_totalprice", "o_orderstatus"))
        .orderBy(col("o_custkey"))
    }),

    // A6: per-column null counts to a single row (reference utils.py:244-273)
    "a6_null_counts" -> ((s, dir) => {
      val withNulls = Tables(s, dir, "customer")
        .withColumn("bal", when(col("c_acctbal") < 0, lit(null))
          .otherwise(col("c_acctbal")))
        .withColumn("seg", nullif(col("c_mktsegment"), lit("BUILDING")))
      graft.operators.Aggregates.nullCounts(withNulls, Seq("bal", "seg"))
    }),

    // A7: per-group avg/stddev/count with exact arithmetic
    // (reference exploration.py:103-152 one-way ANOVA inputs). Variance is
    // spelled out from exact integer-valued sums so both engines agree.
    "a7_group_stats" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("sx"),
          sum(col("l_quantity") * col("l_quantity")).as("sxx"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          (col("sx") / col("n")).as("avg_qty"),
          ((col("sxx") - col("sx") * col("sx") / col("n"))
            / (col("n") - 1)).as("var_qty"),
          col("n"))
        .orderBy(col("l_returnflag"))
    }),

    // A8: exact percentiles (reference exploration.py:366-403 summary;
    // exact `percentile` == DuckDB quantile_cont on the same data)
    "a8_quantiles" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.05)").as("q05"),
          expr("percentile(l_quantity, 0.5)").as("q50"),
          expr("percentile(l_quantity, 0.95)").as("q95"))
        .orderBy(col("l_returnflag"))
    }),

    // A9: distribution counts (reference exploration.py:47-65)
    "a9_dist_count" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority")).count()
        .orderBy(col("o_orderpriority"))
    }),

    // a11 (HLL++ distinct) and a12 (GK sketch quantiles) are retired
    // from the graded surface: their sketch values are engine-specific
    // by construction (HLL register encodings, GK compaction order), so
    // they could never carry a cross-engine oracle. The operators live
    // on in Sketches.approxDistinctByGroup / approxQuantilesByGroup
    // with ≤5% error / rank-error ScalaTest gates, and their
    // DETERMINISTIC engine-portable twins a16/a17 below answer the same
    // questions with exact oracles.

    // A16: KMV distinct sketch — a11's deterministic engine-portable
    // twin (sketch content = k smallest distinct md5-derived hashes, a
    // pure function of the value set), so unlike HLL it has an EXACT
    // cross-engine oracle; same bounded-state map-side-combined plan
    "a16_kmv_distinct" -> ((s, dir) => {
      graft.operators.Sketches.kmvDistinctByGroup(
          Tables(s, dir, "lineitem"), Seq("l_returnflag"), "l_partkey",
          k = 256)
        .orderBy(col("l_returnflag"))
    }),

    // A17: deterministic sampled quantiles — a12's engine-portable twin
    // (exact percentile of a ~k-per-stratum md5-ordered row sample), so
    // unlike the GK sketch it has an EXACT cross-engine oracle; sample
    // selection is one bounded-state aggregate + a scan filter
    "a17_sampled_quantiles" -> ((s, dir) => {
      graft.operators.Sketches.sampledQuantilesByGroup(
          Tables(s, dir, "lineitem"), "l_returnflag", "l_quantity",
          concat_ws("_", col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_suppkey")),
          k = 2048, probs = Seq(0.05, 0.5, 0.95))
        .withColumnRenamed("q_0", "q05").withColumnRenamed("q_1", "q50")
        .withColumnRenamed("q_2", "q95")
        .orderBy(col("l_returnflag"))
    }),

    // A18: skew-safe two-phase aggregation, oracled — the salt +
    // partial/final split from Skew.twoPhaseAgg over the events table's
    // skewed event_type key. The result is BY CONSTRUCTION identical
    // to the direct group-by (counts and integer-cent sums are
    // salt-associative), which is exactly what the oracle certifies;
    // the parity spec already pins salted == plain, this pins both to
    // DuckDB. Plan: two exchanges (salted key, then key) with map-side
    // partial aggregation in each — the 100 TB hot-key shape.
    "a18_salted_agg" -> ((s, dir) => {
      import graft.operators.Skew
      val ev = Tables(s, dir, "events")
        .withColumn("qv", floor(col("value") * 100).cast(LongType))
      Skew.twoPhaseAgg(ev, Seq("event_type"), saltFactor = 16,
        Map(
          "n" -> (("event_id", (c: Column) => count(c),
            (c: Column) => sum(c))),
          "cents" -> (("qv", (c: Column) => sum(c),
            (c: Column) => sum(c)))))
        .select(col("event_type"), col("n"), col("cents"))
        .orderBy(col("event_type"))
    }),

    // A19: unpivot/melt — the wide->long reshape every metrics
    // pipeline needs (Spark's native unpivot, the inverse of a14's
    // pivot): per-flag decimal-exact sums melt into (flag, metric,
    // value) rows. DuckDB replays it as a typed UNION ALL.
    "a19_unpivot" -> ((s, dir) => {
      val wide = Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_price"),
          sum(col("l_discount").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_disc"))
      wide.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "value")
        .orderBy(col("l_returnflag"), col("metric"))
    }),

    // A13: rollup with grouping flags — multi-level subtotals in ONE
    // pass (partial-aggregated per level; the OLAP report shape that
    // would otherwise be 3 scans + a union)
    "a13_rollup" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast(LongType).as("sum_qty"),
          count(lit(1)).as("n"),
          // grouping() is only legal inside the rollup aggregation
          grouping(col("l_returnflag")).as("g_rf"),
          grouping(col("l_linestatus")).as("g_ls"))
        .orderBy(col("g_rf"), col("g_ls"),
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // A14: pivot — status counts per return flag spread into columns
    // (values pinned so the plan needs no discovery pass; absent
    // combinations filled 0 to match the conditional-agg oracle)
    "a14_pivot" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(count(lit(1)))
        .na.fill(0, Seq("F", "O"))
        .orderBy(col("l_returnflag"))
    }),

    // W11: the ranking-window family beyond row_number — rank /
    // dense_rank / percent_rank over a TIED key (well-defined under
    // ties: functions of key equality only) and ntile over a total
    // order (position-dependent, so the unique tiebreak is part of the
    // ordering for cross-engine determinism). percent_rank is an exact
    // IEEE ratio of two integers — identical in both engines — rounded
    // to 9 decimals anyway for hash stability. Scale note: one window
    // sort per partition key; pathologically hot keys take the same
    // two-phase pre-filter story as Sketches.quotaSelect.
    "w11_ranking" -> ((s, dir) => {
      val month = date_trunc("month", col("o_orderdate")).cast(DateType)
      val byMonth = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("mois"))
      val total = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("mois"), col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("mois", month)
        .withColumn("rnk", rank().over(byMonth))
        .withColumn("drnk", dense_rank().over(byMonth))
        .withColumn("prank", round(percent_rank().over(byMonth), 9))
        .withColumn("tile", ntile(4).over(total))
        .select(col("o_orderkey"), col("o_orderpriority"), col("mois"),
          col("rnk"), col("drnk"), col("prank"), col("tile"))
        .orderBy(col("o_orderkey"))
    }),

    // W12: offset/frame window family — lead (the forward twin of W1's
    // lag), first_value over the running frame, last_value over the
    // whole partition (explicit unbounded frame — the default frame
    // stops at CURRENT ROW, a classic silent-wrong-answer), nth_value
    // over the running frame. Ordering is total (ship date + line id),
    // so every value is engine-independent.
    "w12_offset_frames" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val whole = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "lineitem")
        .withColumn("next_qty", lead(col("l_quantity"), 1).over(w))
        .withColumn("first_qty", first(col("l_quantity")).over(w))
        .withColumn("last_qty", last(col("l_quantity")).over(whole))
        .withColumn("second_qty", nth_value(col("l_quantity"), 2).over(w))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          col("next_qty"), col("first_qty"), col("last_qty"),
          col("second_qty"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Scalar function families: dates + strings + row-sum
    // (SURVEY.md §2.8; reference transform.py:106-112, rar_dataset.py:137-144)
    "f_scalar_dates" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .withColumn("month", date_trunc("month", col("o_orderdate"))
          .cast(DateType))
        .withColumn("month_plus3", add_months(date_trunc("month",
          col("o_orderdate")).cast(DateType), 3))
        .withColumn("days_since_epoch",
          datediff(col("o_orderdate").cast(DateType),
            to_date(lit("1990-01-01"))))
        .withColumn("key_concat",
          concat(col("o_orderkey").cast(StringType), lit("-"),
            substring(col("o_orderpriority"), 1, 1)))
        .select(col("o_orderkey"), col("month"), col("month_plus3"),
          col("days_since_epoch"), col("key_concat"))
        .orderBy(col("o_orderkey"))
    }),

    "f_row_sum" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .withColumn("total_rate", rowSum(Seq(col("l_discount"), col("l_tax"))))
        .select(col("l_orderkey"), col("l_linenumber"), col("total_rate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // O1: multi-column ordering (reference exploration.py:253-256)
    "o1_orderby" -> ((s, dir) => {
      Tables(s, dir, "supplier")
        .select(col("s_nationkey"), col("s_suppkey"), col("s_name"))
        .orderBy(col("s_nationkey").asc, col("s_suppkey").desc)
    }),

    // U1: union of two filtered subsets (reference transform.py:1148,1159)
    "u1_union" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val hi = o.filter(col("o_totalprice") > 200000)
        .select(col("o_orderkey"), col("o_totalprice"))
      val lo = o.filter(col("o_totalprice") < 20000)
        .select(col("o_orderkey"), col("o_totalprice"))
      hi.union(lo).orderBy(col("o_orderkey"))
    }),

    // U2: intersect (reference tests/test_model_selection.py:26)
    "u2_intersect" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val a = o.filter(col("o_totalprice") > 100000).select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      a.intersect(b).orderBy(col("o_custkey"))
    }),

    // U3: except (distinct set difference) — completes the set-op
    // family; EXCEPT is a left-anti join on all columns after a
    // distinct, one shuffle each side
    "u3_except" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val a = o.filter(col("o_totalprice") > 100000).select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      a.except(b).orderBy(col("o_custkey"))
    }),

    // A15: cube — all 2^k subtotal combinations in one pass (rollup's
    // lattice superset; same single-scan partial-agg expansion, so the
    // marginal cost over a13 is the extra grouping-set rows, not a
    // second scan)
    "a15_cube" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast(LongType).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping(col("l_returnflag")).as("g_rf"),
          grouping(col("l_linestatus")).as("g_ls"))
        .orderBy(col("g_rf"), col("g_ls"),
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // SQL1: the pricing-summary report (TPC-H Q1 shape) submitted as
    // SQL TEXT through spark.sql — the query-surface twin of the
    // DataFrame forms above. ONE dialect-shared statement serves as
    // both the Spark query and the DuckDB oracle: decimal-cast factor
    // products keep the revenue sums bit-exact across engines.
    "sql1_pricing_summary" -> ((s, dir) => {
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(SqlText.pricingSummary)
    }),

    // SQL2: asymmetric GROUPING SETS — subtotals by returnflag and,
    // separately, by linestatus from ONE scan (the lattice shape
    // rollup/cube can't express; DataFrame API has no grouping-sets
    // builder, so SQL text is the native way to say this in Spark too)
    "sql2_grouping_sets" -> ((s, dir) => {
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(SqlText.groupingSets)
    }),

    // SQL3: customer-segment revenue top-k (TPC-H Q3 shape) as SQL
    // text — 3-table join + agg + deterministic-tiebreak LIMIT.
    // Catalyst plans it like the DataFrame form: filters pushed to
    // all three scans, the two joins shuffle on their keys, TakeOrdered
    // replaces a global sort.
    "sql3_segment_topk" -> ((s, dir) => {
      Tables(s, dir, "customer").createOrReplaceTempView("customer")
      Tables(s, dir, "orders").createOrReplaceTempView("orders")
      Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(SqlText.segmentTopK)
    }),

    // SQL4: TPC-H Q5-shape local-supplier revenue — the 6-way
    // snowflake join (region→nation→customer→orders→lineitem +
    // supplier matched on BOTH suppkey and the customer's nation).
    // The plan Catalyst should pick at any scale: region/nation/
    // customer/supplier broadcast (dimension side), ONE shuffle pair
    // on orderkey for the orders⋈lineitem fact join, partial aggs
    // before the 5-row nation rollup. Shared verbatim with DuckDB
    "sql4_local_supplier" -> ((s, dir) => {
      Seq("region", "nation", "customer", "supplier", "orders",
        "lineitem").foreach(t =>
        Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(SqlText.localSupplierRevenue)
    }),

    // SQL5: TPC-H Q18 shape (large-volume orders) — a HAVING-filtered
    // aggregate subquery gating a 3-way join, then a re-aggregate and
    // top-100. The IN-subquery plans as a semi-join against the
    // map-side-combined lineitem aggregate; AQE broadcasts the tiny
    // qualifying-orderkey set at every harness SF (and would shuffle
    // it only when "large orders" stops being selective). Text shared
    // verbatim with the DuckDB oracle.
    "sql5_large_orders" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem").foreach(t =>
        Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(SqlText.largeOrders)
    })
  )

  /** Dialect-shared SQL texts (run verbatim by Spark AND DuckDB). */
  object SqlText {
    val pricingSummary: String =
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin

    val groupingSets: String =
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS n,
        |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin

    val segmentTopK: String =
      """SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        |  AND l.l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
        |GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin

    val localSupplierRevenue: String =
      """SELECT n.n_name,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |    CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM region r
        |JOIN nation n ON n.n_regionkey = r.r_regionkey
        |JOIN customer c ON c.c_nationkey = n.n_nationkey
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  AND s.s_nationkey = c.c_nationkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n.n_name
        |ORDER BY revenue DESC, n_name""".stripMargin

    val largeOrders: String =
      """SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice,
        |  sum(l.l_quantity) AS sum_qty
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
        |GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
        |ORDER BY o.o_totalprice DESC, o.o_orderkey
        |LIMIT 100""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "a1_agg_named" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "p1_project_rename" ->
      """SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment
        |FROM customer ORDER BY custkey""".stripMargin,

    "p3_derived" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS net_price,
        |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charged
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p4_filter_sql" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus NOT IN ('F', 'P') ORDER BY o_orderkey""".stripMargin,

    "p5_filter_cols" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem
        |WHERE l_returnflag IN ('A', 'R') AND l_quantity BETWEEN 10 AND 40
        |  AND l_shipdate IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p6_conditional" ->
      """SELECT l_orderkey, l_linenumber,
        |  least(greatest(l_quantity, 5.0), 45.0) AS qty_clipped,
        |  CASE WHEN l_quantity >= 30 THEN 1 ELSE 0 END AS bulk_flag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "p7_null_fill" ->
      """SELECT c_custkey,
        |  coalesce(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS seg,
        |  (CASE WHEN (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NULL THEN 1 ELSE 0 END
        |   + CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL THEN 1 ELSE 0 END) AS n_missing
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "p8_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY 1, 2""".stripMargin,

    "p9_cast_pad" ->
      """SELECT c_custkey, lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS custkey_str,
        |  CAST(trunc(c_acctbal) AS INTEGER) AS bal_int
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "a2_keyed_agg" ->
      """SELECT l_suppkey, l_returnflag, sum(l_quantity) AS l_quantity
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "a3_minmax" ->
      """SELECT o_custkey, CAST(min(o_orderdate) AS DATE) AS first_order,
        |  CAST(max(o_orderdate) AS DATE) AS last_order,
        |  max(o_totalprice) AS max_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "a4_grouped_last" ->
      """SELECT o_custkey, arg_max(o_totalprice, o_orderkey) AS o_totalprice,
        |  arg_max(o_orderstatus, o_orderkey) AS o_orderstatus
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "a6_null_counts" ->
      """SELECT count(CASE WHEN c_acctbal < 0 THEN 1 END) AS bal,
        |  count(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 END) AS seg
        |FROM customer""".stripMargin,

    "a7_group_stats" ->
      """SELECT l_returnflag,
        |  sum(l_quantity) / count(*) AS avg_qty,
        |  (sum(l_quantity * l_quantity)
        |    - sum(l_quantity) * sum(l_quantity) / count(*)) / (count(*) - 1) AS var_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a8_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.05) AS q05,
        |  quantile_cont(l_quantity, 0.5) AS q50,
        |  quantile_cont(l_quantity, 0.95) AS q95
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "a9_dist_count" ->
      """SELECT o_orderpriority, count(*) AS count FROM orders
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Replays the KMV sketch exactly: same md5-derived 60-bit hash,
    // k-th smallest DISTINCT hash per group, same estimator constant
    // (255·2^60 in E-notation so DuckDB types it DOUBLE, not DECIMAL —
    // one IEEE division each side, bit-identical)
    "a16_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag,
        |    CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM lineitem),
        |r AS (
        |  SELECT l_returnflag, hv,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM h)
        |SELECT l_returnflag,
        |  CASE WHEN cnt < 256 THEN CAST(cnt AS DOUBLE)
        |       ELSE 255 * 1.152921504606846976e18 / hv END AS kmv_distinct
        |FROM r
        |WHERE rn = CASE WHEN cnt < 256 THEN cnt ELSE 256 END
        |ORDER BY l_returnflag""".stripMargin,

    "a19_unpivot" ->
      """WITH w AS (SELECT l_returnflag,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_qty,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_price,
        |    CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
        |      AS sum_disc
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_price', sum_price FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_disc', sum_disc FROM w
        |ORDER BY l_returnflag, metric""".stripMargin,

    "a18_salted_agg" ->
      """SELECT event_type, count(event_id) AS n,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // Replays the deterministic sample (k-th smallest DISTINCT row-key
    // hash per flag is the selection threshold) then takes the same
    // exact interpolated quantiles over the identical row set
    "a17_sampled_quantiles" ->
      """WITH h AS (
        |  SELECT l_returnflag AS rf, l_quantity AS q,
        |    CAST(('0x' || substr(md5(
        |      CAST(l_orderkey AS VARCHAR) || '_' ||
        |      CAST(l_linenumber AS VARCHAR) || '_' ||
        |      CAST(l_partkey AS VARCHAR) || '_' ||
        |      CAST(l_suppkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM lineitem),
        |thr AS (
        |  SELECT rf, max(hv) AS t FROM (
        |    SELECT rf, hv,
        |      row_number() OVER (PARTITION BY rf ORDER BY hv) AS rn
        |    FROM (SELECT DISTINCT rf, hv FROM h))
        |  WHERE rn <= 2048 GROUP BY rf)
        |SELECT h.rf AS l_returnflag,
        |  quantile_cont(q, 0.05) AS q05,
        |  quantile_cont(q, 0.5) AS q50,
        |  quantile_cont(q, 0.95) AS q95
        |FROM h JOIN thr USING (rf)
        |WHERE h.hv <= thr.t
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "a13_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS n,
        |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,

    "a14_pivot" ->
      """SELECT l_returnflag,
        |  count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS "F",
        |  count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS "O"
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "w11_ranking" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mois,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  round(percent_rank() OVER w, 9) AS prank,
        |  CAST(ntile(4) OVER (PARTITION BY o_orderpriority
        |    ORDER BY CAST(date_trunc('month', o_orderdate) AS DATE),
        |      o_orderkey) AS INT) AS tile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY CAST(date_trunc('month', o_orderdate) AS DATE))
        |ORDER BY o_orderkey""".stripMargin,

    "w12_offset_frames" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey,
        |  lead(l_quantity, 1) OVER w AS next_qty,
        |  first_value(l_quantity) OVER w AS first_qty,
        |  last_value(l_quantity) OVER (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS last_qty,
        |  nth_value(l_quantity, 2) OVER w AS second_qty
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "f_scalar_dates" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  CAST(CAST(date_trunc('month', o_orderdate) AS DATE) + INTERVAL 3 MONTH AS DATE) AS month_plus3,
        |  datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch,
        |  CAST(o_orderkey AS VARCHAR) || '-' || substring(o_orderpriority, 1, 1) AS key_concat
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f_row_sum" ->
      """SELECT l_orderkey, l_linenumber,
        |  coalesce(l_discount, 0) + coalesce(l_tax, 0) AS total_rate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "o1_orderby" ->
      """SELECT s_nationkey, s_suppkey, s_name FROM supplier
        |ORDER BY s_nationkey ASC, s_suppkey DESC""".stripMargin,

    "u1_union" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 200000
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 20000
        |) ORDER BY o_orderkey""".stripMargin,

    "u2_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 100000
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    "u3_except" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 100000
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

    // the SQL-text queries are their own oracle: ONE dialect-shared
    // statement runs verbatim in both engines
    "sql1_pricing_summary" -> SqlText.pricingSummary,
    "sql2_grouping_sets" -> SqlText.groupingSets,
    "sql3_segment_topk" -> SqlText.segmentTopK,
    "sql4_local_supplier" -> SqlText.localSupplierRevenue,
    "sql5_large_orders" -> SqlText.largeOrders,

    "a15_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS n,
        |  GROUPING(l_returnflag) AS g_rf, GROUPING(l_linestatus) AS g_ls
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_rf, g_ls, l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin
  )
}
