package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.ColumnOps
import graft.operators.{AsOfJoin, TimeOps}

/** Harness queries for the reference's window-function surface
  * (SURVEY.md §2.5 W1-W9) — the entity–time panel operators, mapped onto
  * a (custkey, month) panel built from `orders`.
  *
  * Scale note: every query here shuffles exactly once, on the entity key;
  * consecutive windows over the same partitioning reuse the exchange.
  */
object WindowQueries {

  /** Every FileSourceScanExec in an EXECUTED plan, descending through
    * AQE wrappers (AdaptiveSparkPlanExec re-plans behind a leaf;
    * QueryStageExec nodes are leaves wrapping their stage plans) and
    * subqueries. Used by the skipping/DPP queries' require() pins —
    * the executed scan's metrics are the proof the prune fired. */
  private[graft] def executedScans(q: DataFrame)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => walk(a.executedPlan)
      case qs: org.apache.spark.sql.execution.adaptive
          .QueryStageExec => walk(qs.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(walk) ++
        other.subqueries.flatMap(walk)
    }
    walk(q.queryExecution.executedPlan)
  }

  /** Monthly panel: one row per (custkey, month) with exact-decimal
    * amount (A1 aggregation — the base of the reference's join_datasets
    * panel).
    *
    * The fact table is repartitioned on the ENTITY KEY alone before the
    * aggregation: hash(custkey) satisfies the (custkey, mois) clustered
    * distribution, so the groupBy runs without its own exchange AND
    * every downstream Window.partitionBy(custkey) reuses the same
    * partitioning — the whole panel pipeline (agg + lag + diff + mean +
    * fill + as-of) shuffles the data exactly once. */
  private def monthlyPanel(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .repartition(col("o_custkey"))
      .groupBy(col("o_custkey").as("custkey"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("mois"))
      .agg(ColumnOps.exactSum2(col("o_totalprice")).as("amt"),
        count(lit(1)).as("n_orders"))

  /** Dense panel: per-customer monthly spine between first and last
    * active month, left-joined with the sparse panel — missing months
    * carry nulls (the input to fill/interpolation operators). */
  private def densePanel(s: SparkSession, dir: String): DataFrame = {
    val panel = monthlyPanel(s, dir)
    val spans = panel.groupBy(col("custkey"))
      .agg(min(col("mois")).as("d0"), max(col("mois")).as("d1"))
    val spine = TimeOps.explodeInterval(spans, "d0", "d1", "mois")
      .select(col("custkey"), col("mois"))
    spine.join(panel, Seq("custkey", "mois"), "left")
  }

  /** DuckDB CTE prefix matching monthlyPanel/densePanel. */
  private val panelSql =
    """WITH panel AS (
      |  SELECT o_custkey AS custkey,
      |    CAST(date_trunc('month', o_orderdate) AS DATE) AS mois,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amt,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY 1, 2)""".stripMargin

  private val denseSql = panelSql +
    """,
      |spans AS (SELECT custkey, min(mois) AS d0, max(mois) AS d1
      |          FROM panel GROUP BY 1),
      |spine AS (SELECT custkey,
      |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |      CAST(d1 AS TIMESTAMP), INTERVAL 1 MONTH)) AS DATE) AS mois
      |  FROM spans),
      |dense AS (SELECT s.custkey, s.mois, p.amt, p.n_orders
      |          FROM spine s LEFT JOIN panel p USING (custkey, mois))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W1: LagOperator — ROW lag ordered by integer month index
    // (reference transform.py:683-764)
    "w1_lag" -> ((s, dir) => {
      TimeOps.lag_(monthlyPanel(s, dir), Seq("custkey"), "mois",
          Seq("amt"), 1)
        .select(col("custkey"), col("mois"), col("amt"), col("amt_lag1m"))
        .orderBy(col("custkey"), col("mois"))
    }),

    // W2: DiffOperator (reference transform.py:767-843)
    "w2_diff" -> ((s, dir) => {
      TimeOps.diff(monthlyPanel(s, dir), Seq("custkey"), "mois",
          Seq("amt"), 3)
        .select(col("custkey"), col("mois"), col("amt"), col("amt_diff3m"))
        .orderBy(col("custkey"), col("mois"))
    }),

    // W3: MovingAverage — calendar window rangeBetween(-n, 0) on month
    // index, inclusive ⇒ n+1 months (reference transform.py:601-680).
    // Exact-decimal window sum / count so both engines agree bitwise.
    "w3_moving_avg" -> ((s, dir) => {
      val w = Window.partitionBy(col("custkey"))
        .orderBy(ColumnOps.monthIndex(col("mois")))
        .rangeBetween(-5, Window.currentRow)
      monthlyPanel(s, dir)
        .withColumn("amt_mean5m",
          sum(col("amt").cast(DecimalType(18, 2))).over(w).cast(DoubleType)
            / count(col("amt")).over(w))
        .select(col("custkey"), col("mois"), col("amt"), col("amt_mean5m"))
        .orderBy(col("custkey"), col("mois"))
    }),

    // W4: ffill + bfill over the dense panel (reference transform.py:251-269)
    "w4_fill" -> ((s, dir) => {
      val dense = densePanel(s, dir)
        .withColumn("amt_ffill", col("amt"))
        .withColumn("n_bfill", col("n_orders"))
      val filled = TimeOps.bfill(
        TimeOps.ffill(dense, Seq("custkey"), "mois", Seq("amt_ffill")),
        Seq("custkey"), "mois", Seq("n_bfill"))
      filled.select(col("custkey"), col("mois"), col("amt"),
          col("amt_ffill"), col("n_bfill"))
        .orderBy(col("custkey"), col("mois"))
    }),

    // W5: linear interpolation of interior gaps
    // (reference LinearInterpolationOperator, transform.py:939-1054)
    "w5_interpolate" -> ((s, dir) => {
      val dense = densePanel(s, dir).withColumn("amt_interp", col("amt"))
      TimeOps.interpolate(dense, Seq("custkey"), "mois", Seq("amt_interp"))
        .select(col("custkey"), col("mois"), col("amt"), col("amt_interp"))
        .orderBy(col("custkey"), col("mois"))
    }),

    // W6: least-null dedup — keep the most complete row per key
    // (reference extract_financial_DGFiP.py:213-222)
    "w6_leastnull_dedup" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
        .withColumn("v1", when(col("l_discount") > 0.05, col("l_discount")))
        .withColumn("v2", when(col("l_tax") > 0.04, col("l_tax")))
      TimeOps.leastNullDedup(li, Seq("l_orderkey"), Seq("v1", "v2"),
          tieBreak = Seq("l_linenumber", "l_discount", "l_tax"))
        .select(col("l_orderkey"), col("l_linenumber"), col("v1"), col("v2"))
        .orderBy(col("l_orderkey"))
    }),

    // W7: latest-revision dedup (reference extract_debit_urssaf.py:107-135)
    "w7_latest_revision" -> ((s, dir) => {
      TimeOps.latestRevision(Tables(s, dir, "lineitem"),
          Seq("l_orderkey"), "l_linenumber")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"))
    }),

    // W8: gaps-and-islands interval merge (reference extract_ap_data.py:159-180)
    "w8_interval_merge" -> ((s, dir) => {
      val iv = Tables(s, dir, "orders")
        .select(col("o_custkey").as("custkey"),
          date_trunc("month", col("o_orderdate")).cast(DateType).as("date_debut"),
          add_months(date_trunc("month", col("o_orderdate")).cast(DateType), 2)
            .as("date_fin"))
        .distinct()
      TimeOps.mergeIntervals(iv, Seq("custkey"), "date_debut", "date_fin")
        .orderBy(col("custkey"), col("date_debut"))
    }),

    // W9: running sum + count (reference rar_dataset.py:36-76)
    "w9_cumulative" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "orders")
        .withColumn("cum_amount",
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast(DoubleType))
        .withColumn("n_cum", count(lit(1)).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("cum_amount"),
          col("n_cum"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // W13: type-2 slowly-changing dimension build — consecutive
    // same-priority orders collapse, each surviving change gets its
    // [valid_from, valid_to) interval + is_current flag. One shuffle on
    // the key; the lead pass reuses it over the (smaller) change rows
    "w13_scd2" -> ((s, dir) => {
      graft.operators.TimeOps.scd2(
          Tables(s, dir, "orders")
            .select(col("o_custkey"), col("o_orderpriority"),
              col("o_orderdate").cast(DateType).as("odate"),
              col("o_orderkey")),
          keyCols = Seq("o_custkey"), stateCols = Seq("o_orderpriority"),
          orderCol = "odate", tieBreakCol = "o_orderkey")
        .select(col("o_custkey"), col("o_orderpriority"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy(col("o_custkey"), col("valid_from"), col("o_orderpriority"))
    }),

    // W14: versioned snapshot table lifecycle over harness data —
    // create(urgent orders) → append(high orders) → optimize (layout
    // rewrite as a NEW version) → time-travel reads of every version.
    // The observable (per-version exact row count + decimal-exact total)
    // is a pure function of the source table, so DuckDB replays it from
    // `orders` directly: v0 = urgent only, v1 = urgent+high, v2 =
    // optimize's rewrite of v1 (same rows, different layout).
    "w14_snapshot_table" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w14").toString + "/orders_snap"
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority"), col("o_totalprice"))
      SnapshotTable.create(
        orders.filter(col("o_orderpriority") === "1-URGENT"), path)
      SnapshotTable.append(
        orders.filter(col("o_orderpriority") === "2-HIGH"), path)
      SnapshotTable.optimize(s, path,
        targetFileBytes = 128L * 1024 * 1024, sortCols = Seq("o_orderkey"))
      SnapshotTable.versions(s, path).map { v =>
        SnapshotTable.read(s, path, Some(v))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("total"))
          .withColumn("version", lit(v))
      }.reduce(_ unionByName _)
        .select(col("version"), col("n_rows"), col("total"))
        .orderBy(col("version"))
    }),

    // W15: copy-on-write row-level MERGE on the snapshot table —
    // create(urgent orders) → merge(updates = urgent finished orders
    // with doubled price [replacements] + high-priority orders
    // [inserts]) → per-version exact count + decimal-exact total.
    // DuckDB replays the merge relationally: v1 = urgent non-F
    // original ∪ urgent F doubled ∪ high original.
    "w15_snapshot_merge" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w15").toString + "/orders_snap"
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
      SnapshotTable.create(
        orders.filter(col("o_orderpriority") === "1-URGENT"), path)
      val updates = orders
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderstatus") === "F")
        .withColumn("o_totalprice", col("o_totalprice") * 2) unionByName
        orders.filter(col("o_orderpriority") === "2-HIGH")
      SnapshotTable.merge(updates, path, Seq("o_orderkey"))
      SnapshotTable.versions(s, path).map { v =>
        SnapshotTable.read(s, path, Some(v))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("total"))
          .withColumn("version", lit(v))
      }.reduce(_ unionByName _)
        .select(col("version"), col("n_rows"), col("total"))
        .orderBy(col("version"))
    }),

    // W16: row-level change feed (CDC) between snapshot versions —
    // same create→merge lifecycle as w15, then changes(0, 1) reads
    // ONLY the rewritten files and emits exact insert/delete row
    // images (an update = one of each; survivors copied during the
    // rewrite cancel in the multiset diff). DuckDB replays the
    // expected feed relationally: deletes = original urgent finished
    // orders, inserts = their doubled twins ∪ the high-priority rows.
    "w16_snapshot_changes" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w16").toString + "/orders_snap"
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
      SnapshotTable.create(
        orders.filter(col("o_orderpriority") === "1-URGENT"), path)
      val updates = orders
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderstatus") === "F")
        .withColumn("o_totalprice", col("o_totalprice") * 2) unionByName
        orders.filter(col("o_orderpriority") === "2-HIGH")
      SnapshotTable.merge(updates, path, Seq("o_orderkey"))
      SnapshotTable.changes(s, path, 0, Some(1))
        .orderBy(col("change_type"), col("o_orderkey"))
    }),

    // W17: predicate DELETE on the snapshot table — create(urgent
    // orders) → delete(finished) rewrites only the files holding a
    // finished row; a second no-match delete must commit NOTHING (the
    // version list stays [0, 1] — an accidental empty commit would
    // shift the oracle's version column). Per-version exact count +
    // decimal-exact total; DuckDB replays the delete relationally.
    "w17_snapshot_delete" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w17").toString + "/orders_snap"
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
      SnapshotTable.create(
        orders.filter(col("o_orderpriority") === "1-URGENT"), path)
      SnapshotTable.delete(s, path, col("o_orderstatus") === "F")
      SnapshotTable.delete(s, path, lit(false)) // no-op, no new version
      SnapshotTable.versions(s, path).map { v =>
        SnapshotTable.read(s, path, Some(v))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("total"))
          .withColumn("version", lit(v))
      }.reduce(_ unionByName _)
        .select(col("version"), col("n_rows"), col("total"))
        .orderBy(col("version"))
    }),

    // W18: metadata-only schema evolution — create(urgent orders),
    // then evolve-append the high-priority orders with an extra
    // price_band column (no urgent file is rewritten; the column
    // arrives via the log-head schema and pre-evolution rows read it
    // as NULL). The aggregate proves both arms: urgent rows are all
    // band-NULL, appended rows carry the computed band. DuckDB
    // replays the evolved table as a typed UNION ALL.
    "w18_schema_evolution" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w18").toString + "/orders_snap"
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"))
      SnapshotTable.create(
        orders.filter(col("o_orderpriority") === "1-URGENT"), path)
      SnapshotTable.append(
        orders.filter(col("o_orderpriority") === "2-HIGH")
          .withColumn("price_band",
            floor(col("o_totalprice") / 100000.0).cast(LongType)),
        path, evolveSchema = true)
      SnapshotTable.read(s, path)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          count(when(col("price_band").isNull, 1)).as("n_null_band"),
          coalesce(sum(col("price_band")), lit(0L)).as("band_total"))
        .orderBy(col("o_orderpriority"))
    }),

    // W19: incremental materialized-view maintenance — a per-customer
    // (count, cents-total) aggregate snapshot kept in sync with its
    // base table through a MERGE (updates + inserts) and a DELETE
    // (whole customer groups vanish) purely from the CDC feed:
    // refresh cost ∝ churned groups, the base is never rescanned,
    // emptied groups are removed like a recompute would. The oracle
    // IS the full recompute of the final base state — equality proves
    // the delta algebra end-to-end.
    "w19_incremental_view" -> ((s, dir) => {
      import graft.sources.{IncrementalView, SnapshotTable}
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_snap_w19").toString
      val basePath = tmp + "/orders_base"
      val aggPath = tmp + "/orders_agg"
      val orders = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"),
        col("o_totalprice").cast(DecimalType(18, 2)).*(100)
          .cast(LongType).as("cents"))
      SnapshotTable.create(
        orders.filter(col("o_orderpriority") === "1-URGENT"), basePath)
      SnapshotTable.create(
        SnapshotTable.read(s, basePath, Some(0))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("total")),
        aggPath)
      val updates = orders
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderstatus") === "F")
        .withColumn("cents", col("cents") * 2) unionByName
        orders.filter(col("o_orderpriority") === "2-HIGH")
      SnapshotTable.merge(updates, basePath, Seq("o_orderkey"))
      SnapshotTable.delete(s, basePath, col("o_custkey") % 10 === 3)
      IncrementalView.refreshCountSum(s, basePath, aggPath,
        "o_custkey", "cents", fromVersion = 0)
      SnapshotTable.read(s, aggPath).orderBy(col("o_custkey"))
    }),

    // W32: Catalyst-integrated manifest pruning — the snapshot
    // manifest as a Spark FileIndex (Delta's TahoeFileIndex shape),
    // so SQL WHERE text over a temp view prunes files at PLANNING
    // time with no explicit predicate argument. The require() reads
    // the executed scan's numFiles metric: the proof that the filter
    // reached the manifest through Catalyst, not through readWhere's
    // front door. Oracle: the same filter+aggregate over raw orders.
    "w32_catalyst_fileindex" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w32").toString + "/orders_cat"
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"))
      SnapshotTable.create(
        orders.repartitionByRange(16, col("o_orderdate"))
          .sortWithinPartitions(col("o_orderdate")), path)
      SnapshotTable.readCatalyst(s, path)
        .createOrReplaceTempView("orders_snap_w32")
      val q = s.sql(
        """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
          |  count(1) AS n_orders,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total
          |FROM orders_snap_w32
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          |GROUP BY 1 ORDER BY 1""".stripMargin)
      q.collect() // execute so the scan metric is populated
      val numFiles = executedScans(q).headOption
        .map(_.metrics("numFiles").value)
        .getOrElse(sys.error("no FileSourceScanExec under the SQL"))
      require(numFiles < 16,
        s"Catalyst-path manifest pruning regressed: scanned $numFiles/16")
      q
    }),

    // W33: dynamic partition pruning against the snapshot manifest —
    // the decisive 100 TB star-join optimization. The fact (documents
    // partitioned by lang) is served through readCatalyst's
    // GraftFileIndex with a REAL partition schema, so when it joins a
    // file-backed dim whose selective filter (hot langs: above-average
    // doc count — only 'en' at every harness sf) can't be seen
    // statically, Catalyst inserts a DynamicPruningSubquery, reuses
    // the dim's broadcast, and the scan drops 4 of 5 lang partitions
    // at RUNTIME. The require() pins the DPP metrics: staticFilesNum
    // present (DPP fired) and numFiles strictly below it (it pruned).
    // Oracle: the same dim CTE + join over raw documents.
    "w33_dynamic_partition_pruning" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_snap_w33").toString
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      SnapshotTable.create(docs, tmp + "/docs_part",
        partitionBy = Seq("lang"))
      // dim must be FILE-backed (PartitionPruning skips LocalRelation
      // build sides) and its filter must be a
      // COMPARISON (isLikelySelective rejects a bare boolean column),
      // so the above-average threshold lands as a literal
      val total = docs.count()
      docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .write.parquet(tmp + "/lang_dim")
      SnapshotTable.readCatalyst(s, tmp + "/docs_part")
        .createOrReplaceTempView("docs_snap_w33")
      s.read.parquet(tmp + "/lang_dim")
        .createOrReplaceTempView("lang_dim_w33")
      val q = s.sql(
        s"""SELECT f.lang, count(1) AS n_docs,
           |  CAST(sum(f.n_chars) AS BIGINT) AS chars
           |FROM docs_snap_w33 f
           |JOIN lang_dim_w33 d ON f.lang = d.lang
           |WHERE d.n_docs > ${total / 5.0}
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      q.collect()
      val scan = executedScans(q)
        .find(_.relation.location.isInstanceOf[graft.sources.GraftFileIndex])
        .getOrElse(sys.error("no scan over GraftFileIndex"))
      require(scan.metrics.contains("staticFilesNum"),
        "DPP regressed: no DynamicPruningSubquery on the fact scan")
      require(scan.metrics("numFiles").value <
        scan.metrics("staticFilesNum").value,
        s"DPP pruned nothing: ${scan.metrics("numFiles").value} of " +
          s"${scan.metrics("staticFilesNum").value} files read")
      q
    }),

    // W34: the Catalyst read path COMPOSED with merge-on-read deletes
    // and column mapping — exactly the tables that most need DPP at
    // 100 TB (big fact tables taking MoR deletes, tables that have
    // renamed a column) used to silently fall back to the classic
    // reader. Here the fact is MoR-deleted (deletion vectors pending —
    // pinned), a column is renamed (mapping active), and the DPP join
    // still fires through both wrappers: the anti-join mask and the
    // physical→logical projection are transparent to Catalyst's
    // pushdown. Oracle: the same dim CTE + join over raw documents
    // with the delete predicate replayed.
    "w34_catalyst_mor_mapping" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_snap_w34").toString
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      SnapshotTable.create(docs, tmp + "/docs_part",
        partitionBy = Seq("lang"))
      // MoR delete: zero data files rewritten, vectors pending
      SnapshotTable.deleteMoR(s, tmp + "/docs_part",
        col("doc_id") % 7L === 0L)
      require(SnapshotTable.pendingDvEntries(s, tmp + "/docs_part") > 0,
        "w34 setup: expected pending deletion vectors")
      // column mapping: metadata-only rename, old files keep serving
      // the bytes under the stable physical name
      SnapshotTable.renameColumn(s, tmp + "/docs_part",
        "n_chars", "chars_n")
      val total = docs.count()
      docs.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"))
        .write.parquet(tmp + "/lang_dim")
      SnapshotTable.readCatalyst(s, tmp + "/docs_part")
        .createOrReplaceTempView("docs_snap_w34")
      s.read.parquet(tmp + "/lang_dim")
        .createOrReplaceTempView("lang_dim_w34")
      val q = s.sql(
        s"""SELECT f.lang, count(1) AS n_docs,
           |  CAST(sum(f.chars_n) AS BIGINT) AS chars
           |FROM docs_snap_w34 f
           |JOIN lang_dim_w34 d ON f.lang = d.lang
           |WHERE d.n_docs > ${total / 5.0}
           |GROUP BY 1 ORDER BY 1""".stripMargin)
      q.collect()
      val scan = executedScans(q)
        .find(_.relation.location.isInstanceOf[graft.sources.GraftFileIndex])
        .getOrElse(sys.error(
          "w34 fell back to the classic reader: no GraftFileIndex scan"))
      require(scan.metrics.contains("staticFilesNum"),
        "DPP regressed through the DV/mapping wrappers")
      require(scan.metrics("numFiles").value <
        scan.metrics("staticFilesNum").value,
        s"DPP pruned nothing: ${scan.metrics("numFiles").value} of " +
          s"${scan.metrics("staticFilesNum").value} files read")
      q
    }),

    // W35: a TIMESTAMP-partitioned table served through the Catalyst
    // read path — the reference's natural layout key (monthly périodes)
    // is temporal, and timestamp partition values used to be the one
    // remaining fallback trigger. The writer renders timestamp dirs in
    // the session zone; GraftFileIndex decodes them back with the same
    // zone, so static pruning on the partition column fires at
    // planning time (pinned via the scan metric). Oracle: the same
    // year-range filter + monthly aggregate over raw orders.
    "w35_timestamp_partitions" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w35").toString + "/orders_tsp"
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"))
        .withColumn("order_year", date_trunc("year", col("o_orderdate")))
      SnapshotTable.create(orders, path, partitionBy = Seq("order_year"))
      val nTotal = SnapshotTable.read(s, path).inputFiles.length
      SnapshotTable.readCatalyst(s, path)
        .createOrReplaceTempView("orders_tsp_w35")
      val q = s.sql(
        """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
          |  count(1) AS n_orders,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |    AS total
          |FROM orders_tsp_w35
          |WHERE order_year >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND order_year < TIMESTAMP '1998-01-01 00:00:00'
          |GROUP BY 1 ORDER BY 1""".stripMargin)
      q.collect()
      val scan = executedScans(q)
        .find(_.relation.location.isInstanceOf[graft.sources.GraftFileIndex])
        .getOrElse(sys.error(
          "w35 fell back to the classic reader: no GraftFileIndex scan"))
      require(scan.metrics("numFiles").value < nTotal,
        s"timestamp partition pruning regressed: scanned " +
          s"${scan.metrics("numFiles").value} of $nTotal files")
      q
    }),

    // W31: bloom-filter point-lookup skipping — the complement to
    // min/max ranges, which prune NOTHING on a hash-distributed key
    // (every file spans the whole value range; the first require()
    // pins that honestly). indexBloom publishes per-file blooms as a
    // metadata-only commit; the same equality probe then prunes to
    // ~1 file from the manifest alone. The probe key is the largest
    // doc_id <= max/2 — deterministic, mid-range, so no file's range
    // excludes it. Oracle: the same point lookup over raw parquet.
    "w31_bloom_skipping" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w31").toString + "/docs_hash"
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      SnapshotTable.create(docs.repartition(16, col("doc_id")), path)
      val mid = docs.agg(max(col("doc_id"))).head().getLong(0) / 2
      val target = docs.filter(col("doc_id") <= mid)
        .agg(max(col("doc_id"))).head().getLong(0)
      val (_, keptNo, total) = SnapshotTable.readWherePruned(s, path,
        col("doc_id") === target)
      require(keptNo == total,
        s"ranges should NOT prune a hash layout: kept $keptNo of $total")
      SnapshotTable.indexBloom(s, path, Seq("doc_id"))
      val (pruned, kept, total2) = SnapshotTable.readWherePruned(s, path,
        col("doc_id") === target)
      require(kept * 4 < total2,
        s"bloom skipping regressed: kept $kept of $total2")
      pruned.select(col("doc_id"), col("lang"), col("source"),
        col("n_chars"))
    }),

    // W30: partition × z-order COMPOSITE layout — the production
    // lakehouse shape w20 (hive partitions) and w23 (flat z-order)
    // only covered separately. Orders are hive-partitioned by
    // priority with (custkey, orderdate) z-clustered within each
    // partition; a three-way conjunctive predicate then prunes
    // MULTIPLICATIVELY: partition dirs drop 4/5 of the files in the
    // driver, and per-file z bounds drop most of the surviving
    // partition. The require()s pin both levels separately. Oracle:
    // the same filter+aggregate over raw orders.
    "w30_partition_zorder" -> ((s, dir) => {
      import graft.sources.{SnapshotTable, ZOrder}
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w30").toString + "/orders_pz"
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_orderpriority"), col("o_totalprice"))
      SnapshotTable.create(
        ZOrder.zOrderWithin(orders, Seq("o_orderpriority"),
          Seq("o_custkey", "o_orderdate"), 40),
        path, partitionBy = Seq("o_orderpriority"))
      val maxCust = orders.agg(max(col("o_custkey"))).head().getLong(0)
      val lo = to_timestamp(lit("1996-01-01 00:00:00"))
      val hi = to_timestamp(lit("1998-01-01 00:00:00"))
      // level 1: partition value alone (driver-side dir prune)
      val (_, keptPart, total) = SnapshotTable.readWherePruned(s, path,
        col("o_orderpriority") === "1-URGENT")
      require(keptPart * 3 < total,
        s"partition pruning regressed: kept $keptPart of $total")
      // level 2: + z-range predicate prunes WITHIN the partition
      val (pruned, kept, _) = SnapshotTable.readWherePruned(s, path,
        col("o_orderpriority") === "1-URGENT" &&
          col("o_custkey") <= maxCust / 4 &&
          col("o_orderdate") >= lo && col("o_orderdate") < hi)
      require(kept * 2 < keptPart && kept * 8 < total,
        s"composite pruning regressed: kept $kept of $total " +
          s"($keptPart in partition)")
      pruned
        .groupBy(date_trunc("year", col("o_orderdate")).cast(DateType)
          .as("year"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderkey")).as("first_key"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("total"))
        .orderBy(col("year"))
    }),

    // W29: column rename/drop through field-stable physical names
    // (Delta-style column mapping) — both are METADATA-ONLY commits
    // (require() pins zero file churn), old files serve a renamed
    // column under its stable physical name, and a dropped-then-
    // re-added logical name binds a FRESH physical slot so the old
    // bytes never resurrect (pinned by the custkeys count: only the
    // post-re-add slice is non-null). Oracle replays the final state.
    "w29_schema_rename_drop" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w29").toString + "/orders_snap"
      val orders = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        col("o_totalprice").cast(DecimalType(18, 2)).*(100)
          .cast(LongType).as("cents"))
      def slice(p: String) = orders
        .filter(col("o_orderpriority") === p).drop("o_orderpriority")
      SnapshotTable.create(slice("1-URGENT"), path)
      val files0 = SnapshotTable.read(s, path).inputFiles.toSet
      SnapshotTable.renameColumn(s, path, "cents", "price_cents")
      require(SnapshotTable.read(s, path).inputFiles.toSet == files0,
        "rename rewrote data files")
      SnapshotTable.append(
        slice("2-HIGH").withColumnRenamed("cents", "price_cents"), path)
      val preDrop = SnapshotTable.read(s, path).inputFiles.toSet
      SnapshotTable.dropColumn(s, path, "o_custkey")
      require(SnapshotTable.read(s, path).inputFiles.toSet == preDrop,
        "drop rewrote data files")
      SnapshotTable.append(
        slice("3-MEDIUM").withColumnRenamed("cents", "price_cents")
          .select(col("o_orderkey"), col("price_cents"),
            col("o_custkey")),
        path, evolveSchema = true)
      SnapshotTable.read(s, path)
        .agg(count(lit(1)).as("n_rows"),
          sum(col("price_cents")).as("total"),
          count(col("o_custkey")).as("custkeys"))
    }),

    // W28: incremental min/max view maintenance — the delta algebra
    // w19 can't do. Inserts tighten min/max exactly; the final DELETE
    // of every top-priced row removes many groups' CURRENT max, which
    // drives the invalidate-and-recompute arm (only those groups
    // rescan the base, via a semi-join-restricted read). Oracle: full
    // recompute of count/sum/min/max over the replayed final state.
    "w28_incremental_minmax" -> ((s, dir) => {
      import graft.sources.{IncrementalView, SnapshotTable}
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_snap_w28").toString
      val basePath = tmp + "/orders_base"
      val aggPath = tmp + "/orders_agg"
      val orders = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"),
        col("o_totalprice").cast(DecimalType(18, 2)).*(100)
          .cast(LongType).as("cents"))
      SnapshotTable.create(
        orders.filter(col("o_orderpriority") === "1-URGENT"), basePath)
      SnapshotTable.create(
        SnapshotTable.read(s, basePath, Some(0))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("total"),
            min(col("cents")).as("mn"), max(col("cents")).as("mx")),
        aggPath)
      // churn: double F orders (update = delete+insert of potential
      // extrema), add the 2-HIGH slice (inserts + brand-new groups),
      // then delete every top-priced row (max invalidation)
      val updates = orders
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderstatus") === "F")
        .withColumn("cents", col("cents") * 2) unionByName
        orders.filter(col("o_orderpriority") === "2-HIGH")
      SnapshotTable.merge(updates, basePath, Seq("o_orderkey"))
      SnapshotTable.delete(s, basePath, col("cents") > 25000000L)
      IncrementalView.refreshCountSumMinMax(s, basePath, aggPath,
        "o_custkey", "cents", fromVersion = 0)
      SnapshotTable.read(s, aggPath).orderBy(col("o_custkey"))
    }),

    // W37: SEGMENTED MANIFESTS — the manifest-tree half of the 100 TB
    // metadata story (the r10 ManifestScaleProbe measured the flat
    // format's ceiling: an O(#files) manifest rewritten per commit).
    // Above the segment threshold a version's manifest is a LIST of
    // immutable entry segments; commits reuse every segment whose
    // entries survive unchanged. Lifecycle: create (range-clustered,
    // 4 segments) → append (reuses ALL prior segments — pinned) →
    // localized delete (rewrites only straddling segments — reuse
    // pinned). Oracle replays the final state relationally.
    "w37_segmented_manifest" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w37").toString + "/orders_seg"
      s.conf.set("spark.graft.manifest.segmentEntries", "6")
      try {
        val orders = Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"))
        def slice(p: String) =
          orders.filter(col("o_orderpriority") === p)
        SnapshotTable.create(
          slice("1-URGENT").repartitionByRange(24, col("o_orderkey"))
            .sortWithinPartitions(col("o_orderkey")), path)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          s.sparkContext.hadoopConfiguration)
        def segRefs(v: Int): Set[String] = {
          val in = fs.open(new org.apache.hadoop.fs.Path(
            path + f"/_graft_log/v$v%08d.manifest"))
          try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
            .filter(_.startsWith("@seg=")).map(_.split("\t")(0)).toSet
          finally in.close()
        }
        require(segRefs(0).size >= 3,
          s"w37 setup: expected a segmented create, got ${segRefs(0).size}")
        SnapshotTable.append(slice("2-HIGH").coalesce(2), path)
        require(segRefs(0).subsetOf(segRefs(1)),
          "append rewrote previously-committed segments (reuse regressed)")
        // delete the TOP 2% of the key range — localized at the tail
        // under any key distribution (a bottom-anchored cut wipes a
        // whole remapped copy band in the GenScale sf1 data)
        val mx = slice("1-URGENT").agg(max(col("o_orderkey")))
          .head().getLong(0)
        SnapshotTable.delete(s, path, col("o_orderkey") >= mx - mx / 50)
        val reused = segRefs(2) intersect segRefs(1)
        require(reused.size >= 3,
          s"localized delete reused only ${reused.size} segments of " +
            s"${segRefs(1).size} — churn-proportional commits regressed")
        SnapshotTable.read(s, path)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("total"))
          .orderBy(col("o_orderpriority"))
      } finally s.conf.unset("spark.graft.manifest.segmentEntries")
    }),

    // W38: OPTIMISTIC CONFLICT RESOLUTION — row-level commits no
    // longer serialize on abort-only: two merges racing from the SAME
    // snapshot both land when their touched files and key ranges are
    // provably disjoint (the loser REBASES onto the winner's commit),
    // while a true overlap still refuses. Lifecycle: create
    // (key-clustered, 16 files) → mergeAt(v0) doubling the LOW
    // tenth's cents → mergeAt(v0) tripling the HIGH tenth's cents
    // (disjoint — rebases onto v1, pinned by the version number) →
    // an overlapping mergeAt(v0) must throw. Oracle replays both
    // surviving merges relationally.
    "w38_concurrent_merge" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w38").toString + "/orders_race"
      val orders = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast(DecimalType(18, 2)).*(100)
          .cast(LongType).as("cents"))
      SnapshotTable.create(
        orders.repartitionByRange(16, col("o_orderkey"))
          .sortWithinPartitions(col("o_orderkey")), path)
      val maxK = orders.agg(max(col("o_orderkey"))).head().getLong(0)
      val updLow = orders.filter(col("o_orderkey") <= maxK / 10)
        .withColumn("cents", col("cents") * 2)
      val updHigh = orders
        .filter(col("o_orderkey") >= maxK - maxK / 10)
        .withColumn("cents", col("cents") * 3)
      require(SnapshotTable.mergeAt(updLow, path,
        Seq("o_orderkey"), 0) == 1)
      // SAME snapshot — a genuine write-write race; disjoint files
      // and key ranges → the loser rebases and commits v2
      require(SnapshotTable.mergeAt(updHigh, path,
        Seq("o_orderkey"), 0) == 2,
        "disjoint concurrent merge failed to rebase")
      // true overlap (the low files were rewritten by v1) must refuse
      val refused =
        try {
          SnapshotTable.mergeAt(updLow, path, Seq("o_orderkey"), 0)
          false
        } catch {
          case _: java.util.ConcurrentModificationException => true
        }
      require(refused, "overlapping concurrent merge was not refused")
      SnapshotTable.read(s, path)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("total"))
        .orderBy(col("o_orderpriority"))
    }),

    // W39: MERGE SCHEMA EVOLUTION — CDC upserts with drifting source
    // schemas, the ingestion path append-only evolution (w18) could
    // not serve. Lifecycle: create (o_orderkey, qty INT, cents) on
    // the URGENT slice → merge the HIGH slice carrying a NEW column
    // (o_custkey; pre-evolution rows read NULL) → merge the MEDIUM
    // slice with qty WIDENED int→bigint in the same commit (metadata
    // only — disjoint keys, zero rewrites) → a retyping merge must
    // refuse even with evolveSchema. Oracle: typed UNION replay with
    // NULL backfill.
    "w39_merge_evolution" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w39").toString + "/orders_evo"
      val orders = Tables(s, dir, "orders")
      val cents = col("o_totalprice").cast(DecimalType(18, 2)).*(100)
        .cast(LongType).as("cents")
      def slice(p: String) =
        orders.filter(col("o_orderpriority") === p)
      SnapshotTable.create(slice("1-URGENT").select(col("o_orderkey"),
        (col("o_orderkey") % 100).cast(IntegerType).as("qty"), cents),
        path)
      SnapshotTable.merge(slice("2-HIGH").select(col("o_orderkey"),
        (col("o_orderkey") % 100).cast(IntegerType).as("qty"), cents,
        col("o_custkey")), path, Seq("o_orderkey"),
        evolveSchema = true)
      SnapshotTable.merge(slice("3-MEDIUM").select(col("o_orderkey"),
        (col("o_orderkey") % 100).as("qty"), cents,
        col("o_custkey")), path, Seq("o_orderkey"),
        evolveSchema = true)
      val refused =
        try {
          SnapshotTable.merge(slice("3-MEDIUM")
            .select(col("o_orderkey"),
              (col("o_orderkey") % 100).as("qty"),
              cents.cast(StringType).as("cents"), col("o_custkey")),
            path, Seq("o_orderkey"), evolveSchema = true)
          false
        } catch { case _: RuntimeException => true }
      require(refused, "retyping merge was not refused")
      val got = SnapshotTable.read(s, path)
      require(got.schema("qty").dataType == LongType,
        "merge failed to widen qty int -> bigint")
      got.agg(count(lit(1)).as("n_rows"),
        sum(col("qty")).as("qty_total"),
        sum(col("cents")).as("total"),
        count(col("o_custkey")).as("with_cust"))
    }),

    // W40: the snapshot table as a REGISTERED SPARK DATA SOURCE —
    // spark.read/write.format("graft") with V1 filter + projection
    // pushdown riding the manifest machinery (readWhere underneath),
    // partitioned create via writer option, append mode, and
    // versionAsOf time travel. The require() pins time travel; the
    // graded output reads back through the format with a pushed
    // filter. Oracle replays the two written slices relationally.
    "w40_datasource_roundtrip" -> ((s, dir) => {
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w40").toString + "/orders_ds"
      val orders = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast(DecimalType(18, 2)).*(100)
          .cast(LongType).as("cents"))
      orders.filter(col("o_orderpriority") === "1-URGENT")
        .write.format("graft")
        .option("partitionBy", "o_orderpriority").save(path)
      orders.filter(col("o_orderpriority") === "2-HIGH")
        .write.format("graft").mode("append").save(path)
      val v0 = s.read.format("graft").option("versionAsOf", "0")
        .load(path).count()
      require(v0 == orders
        .filter(col("o_orderpriority") === "1-URGENT").count(),
        "versionAsOf time travel through the data source regressed")
      s.read.format("graft").load(path)
        .filter(col("cents") > 10000000L)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("total"))
        .orderBy(col("o_orderpriority"))
    }),

    // W36: min/max view maintenance with a MANIFEST-PRUNED invalidate
    // rescan — w28's scale caveat closed. The base is custkey-
    // clustered at create time and the churn is LOCALIZED (an append,
    // plus a delete of top-priced rows in the low fifth of the key
    // range), so the groups whose max may be gone all live in a narrow
    // key range: the recompute arm restricts the base scan to manifest
    // entries intersecting the invalidated [min, max] and the
    // require() pins files-read < total. (w28 keeps grading the
    // scattered-invalidation case, where keeping every file is the
    // only sound answer.) Oracle: full recompute of the final state.
    "w36_pruned_minmax_rescan" -> ((s, dir) => {
      import graft.sources.{IncrementalView, SnapshotTable}
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_snap_w36").toString
      val basePath = tmp + "/orders_base"
      val aggPath = tmp + "/orders_agg"
      val orders = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"),
        col("o_totalprice").cast(DecimalType(18, 2)).*(100)
          .cast(LongType).as("cents"))
      def slice(p: String) =
        orders.filter(col("o_orderpriority") === p)
      SnapshotTable.create(
        slice("1-URGENT").repartitionByRange(12, col("o_custkey"))
          .sortWithinPartitions(col("o_custkey")),
        basePath)
      SnapshotTable.create(
        SnapshotTable.read(s, basePath, Some(0))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("total"),
            min(col("cents")).as("mn"), max(col("cents")).as("mx")),
        aggPath)
      // churn: an append (inserts tighten exactly, no rescan) plus a
      // LOCALIZED delete — only low-custkey groups can be invalidated
      SnapshotTable.append(slice("2-HIGH"), basePath)
      val m = slice("1-URGENT").agg(max(col("o_custkey")))
        .head().getLong(0)
      SnapshotTable.delete(s, basePath,
        col("cents") > 20000000L && col("o_custkey") <= m / 5)
      val (_, kept, total) = IncrementalView.refreshCountSumMinMaxPruned(
        s, basePath, aggPath, "o_custkey", "cents", fromVersion = 0)
      require(kept > 0 && kept < total,
        s"pruned rescan regressed: read $kept of $total base files " +
          "(expected a strict subset on a clustered base with " +
          "localized invalidation)")
      SnapshotTable.read(s, aggPath).orderBy(col("o_custkey"))
    }),

    // W20: hive-partitioned snapshot table + partition-pruned read —
    // documents partitioned by lang, then readWhere(lang IN (en, fr))
    // resolves the file set in the DRIVER from the manifest's
    // partition values (no footer reads, no tasks for the other three
    // languages; the require() makes the query fail loudly if pruning
    // ever regresses). At 100 TB this is "scan the partition, not the
    // table". Oracle: the same filter+aggregate over the raw parquet.
    "w20_partitioned_read" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w20").toString + "/docs_part"
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      SnapshotTable.create(docs, path, partitionBy = Seq("lang"))
      val (pruned, kept, total) = SnapshotTable.readWherePruned(s, path,
        col("lang").isin("en", "fr") && col("n_chars") >= 200L)
      require(kept < total,
        s"partition pruning regressed: kept $kept of $total files")
      pruned.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .orderBy(col("lang"), col("source"))
    }),

    // W21: manifest data skipping on a flat, range-clustered table —
    // orders laid out by repartitionByRange(o_orderdate), so each
    // staged file covers a narrow time span whose min/max micros ride
    // in its manifest entry; a half-year predicate keeps only the
    // straddling files (require() guards the prune), again with zero
    // footer I/O. The timestamp literal folds through the analyzer
    // exactly as the evaluator expects. Oracle: plain range filter.
    "w21_data_skipping" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w21").toString + "/orders_clustered"
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"))
      SnapshotTable.create(
        orders.repartitionByRange(16, col("o_orderdate"))
          .sortWithinPartitions(col("o_orderdate")),
        path)
      val lo = to_timestamp(lit("1996-01-01 00:00:00"))
      val hi = to_timestamp(lit("1996-07-01 00:00:00"))
      val (pruned, kept, total) = SnapshotTable.readWherePruned(s, path,
        col("o_orderdate") >= lo && col("o_orderdate") < hi)
      require(kept < total,
        s"key-range skipping regressed: kept $kept of $total files")
      pruned
        .groupBy(date_trunc("month", col("o_orderdate")).cast(DateType)
          .as("month"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("total"))
        .orderBy(col("month"))
    }),

    // W41: NULL-COUNT data skipping (Delta's nullCount shape) — a
    // nullable column whose nulls cluster in the low key range (ship
    // date absent for low-priced orders here), key-clustered into 16
    // snapshot files. `IS NULL` prunes to the null-bearing files from
    // the manifest's z!/rows items alone; `IS NOT NULL` on an
    // everywhere-null column keeps ZERO files. The require() pins
    // both. Oracle: the same filter+aggregate over raw orders with
    // the null injection replayed relationally.
    "w41_null_skipping" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w41").toString + "/orders_nulls"
      val orders = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        when(col("o_orderkey") % 10 < 3, lit(null).cast(LongType))
          .otherwise((col("o_totalprice").cast(DecimalType(18, 2)) * 100)
            .cast(LongType)).as("cents"),
        lit(null).cast(LongType).as("legacy_score"))
      SnapshotTable.create(
        orders.repartitionByRange(16, col("o_orderkey"))
          .sortWithinPartitions(col("o_orderkey")), path)
      // nulls are key-scattered (o_orderkey % 10), so IS NULL keeps
      // everything here — re-cluster BY NULLNESS to localize them,
      // the layout a real pipeline uses for sparse columns
      SnapshotTable.overwrite(
        SnapshotTable.read(s, path)
          .repartitionByRange(16, col("cents").isNull, col("o_orderkey"))
          .sortWithinPartitions(col("cents").isNull, col("o_orderkey")),
        path)
      val (nulls, keptN, totalN) = SnapshotTable.readWherePruned(s, path,
        col("cents").isNull)
      require(keptN < totalN,
        s"IS NULL skipping regressed: kept $keptN of $totalN files")
      val (_, keptD, _) = SnapshotTable.readWherePruned(s, path,
        col("legacy_score").isNotNull)
      require(keptD == 0,
        s"IS NOT NULL on an all-null column kept $keptD files")
      nulls.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_null_cents"))
        .orderBy(col("o_orderpriority"))
    }),

    // W42: the manifest as a queryable METADATA TABLE (Delta
    // `describe detail` / Iceberg `.files` shape), graded by
    // RECONCILIATION: after a copy-on-write delete (rewrites files)
    // AND a merge-on-read delete (masks rows via per-file DV blobs,
    // rewrites nothing), the per-partition `sum(rows) -
    // sum(dv_positions)` computed from MANIFEST METADATA ALONE must
    // equal the live count(*) DuckDB computes from the data. Pins
    // both the exactness of the rows= stats and the v2 DV descriptor
    // cardinalities; the metadata scan itself is distributed
    // (segments resolve in tasks), so the verb holds at million-file
    // scale. No data file is read by the graded aggregate.
    // W43: RESTORE (time travel made writable) × batch change feed.
    // v0 full table → v1 CoW delete of slice A → v2 append of slice B
    // → v3 RESTORE to v0, a METADATA-ONLY commit (require-pinned:
    // v3's entry set IS v0's, byte-for-byte — zero data I/O). The
    // batch CDF through spark.read.format("graft") then prices the
    // whole lifecycle: v1 deletes A, v2 inserts B, and the restore
    // arrives as one churn-sized diff (A resurrected as inserts, B
    // rolled back as deletes) — each class restated relationally by
    // the oracle, so a restore that re-read or re-wrote data, or a
    // feed that mis-diffed it, breaks count and sum together.
    "w43_restore_cdf" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w43").toString + "/orders_r"
      val orders = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      SnapshotTable.create(
        orders.repartitionByRange(4, col("o_orderkey"))
          .sortWithinPartitions(col("o_orderkey")), path)
      SnapshotTable.delete(s, path, col("o_orderkey") % 10 === 3L)
      val maxKey = orders.agg(max(col("o_orderkey"))).head().getLong(0)
      SnapshotTable.append(
        orders.filter(col("o_orderkey") % 100 === 1L)
          .withColumn("o_orderkey", col("o_orderkey") + lit(maxKey)),
        path)
      val v3 = SnapshotTable.restore(s, path, 0)
      require(v3 == 3, s"restore committed $v3, expected 3")
      require(SnapshotTable.manifestEntries(s, path, 3).toSet ==
          SnapshotTable.manifestEntries(s, path, 0).toSet,
        "restore must reference v0's manifest entries verbatim — " +
          "metadata-only, zero data I/O")
      s.read.format("graft").option("readChangeFeed", "true")
        .option("startingVersion", "1").load(path)
        .groupBy(col("_commit_version"), col("change_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("total"))
        .orderBy(col("_commit_version"), col("change_type"))
    }),

    // W44: the SQL DML surface end-to-end through the catalog — one
    // `USING graft` table driven ONLY by SQL statements (INSERT INTO,
    // DELETE FROM, UPDATE, MERGE INTO upsert with a self-referencing
    // source), each one manifest commit via the GraftExtensions
    // post-hoc rewrite (GraftInserts.scala). The oracle restates the
    // statement sequence relationally over raw customer. The MERGE's
    // source reads the pre-merge snapshot (its own table), so the
    // oracle composes s2 (post-update state) for both the negation
    // and the inserted shifted rows.
    "w44_sql_dml" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w44").toString + "/cust_sql"
      val cust = Tables(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      SnapshotTable.create(
        cust.repartitionByRange(4, col("c_custkey"))
          .sortWithinPartitions(col("c_custkey")), path)
      val tbl = "graft_w44_" + java.util.UUID.randomUUID()
        .toString.replace("-", "").take(8)
      s.sql(s"CREATE TABLE $tbl USING graft OPTIONS (path '$path')")
      try {
        s.sql(s"INSERT INTO $tbl VALUES (CAST(20000000 AS BIGINT), " +
          "CAST(98 AS INT), CAST(7.25 AS DOUBLE))")
        s.sql(s"DELETE FROM $tbl WHERE c_custkey % 10 = 3")
        s.sql(s"UPDATE $tbl SET c_acctbal = c_acctbal + 1000.0 " +
          "WHERE c_nationkey < 5")
        s.sql(s"""MERGE INTO $tbl t USING (
          |  SELECT c_custkey, c_nationkey,
          |         -c_acctbal AS c_acctbal
          |  FROM $tbl WHERE c_custkey % 7 = 0
          |  UNION ALL
          |  SELECT CAST(c_custkey + 10000000 AS BIGINT),
          |         CAST(99 AS INT), CAST(5.0 AS DOUBLE)
          |  FROM $tbl WHERE c_custkey % 500 = 1
          |) src ON t.c_custkey = src.c_custkey
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        // four statements = four ordinary commits on top of create
        require(SnapshotTable.versions(s, path).max == 4,
          "each SQL statement must land as exactly one manifest commit")
        s.table(tbl)
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n"),
            sum(col("c_acctbal").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("bal_total"),
            sum(col("c_custkey")).as("key_total"))
          .orderBy(col("c_nationkey"))
      } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
    }),

    // W45: the RICH SQL MERGE surface (round-17) — clause
    // AND-conditions, explicit SET lists, and WHEN NOT MATCHED BY
    // SOURCE, each statement still exactly ONE keyed-merge manifest
    // commit (GraftMergeRichCommand). Statement 1: a conditional
    // update-or-delete over a self-referencing source (doubled
    // balances above a threshold update and shift the nation key,
    // the rest of the matched slice deletes). Statement 2: the
    // sync-two-tables idiom — even keys refresh, stale odd keys
    // delete below a nation threshold and zero out above it. The
    // oracle restates both statements relationally over raw customer.
    "w45_sql_merge_rich" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w45").toString + "/cust_rich"
      val cust = Tables(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      SnapshotTable.create(
        cust.repartitionByRange(4, col("c_custkey"))
          .sortWithinPartitions(col("c_custkey")), path)
      val tbl = "graft_w45_" + java.util.UUID.randomUUID()
        .toString.replace("-", "").take(8)
      s.sql(s"CREATE TABLE $tbl USING graft OPTIONS (path '$path')")
      try {
        s.sql(s"""MERGE INTO $tbl t USING (
          |  SELECT c_custkey, c_acctbal * 2 AS newbal
          |  FROM $tbl WHERE c_custkey % 3 = 0
          |) src ON t.c_custkey = src.c_custkey
          |WHEN MATCHED AND src.newbal > 1000.0 THEN UPDATE SET
          |  c_acctbal = src.newbal, c_nationkey = t.c_nationkey + 100
          |WHEN MATCHED THEN DELETE""".stripMargin)
        s.sql(s"""MERGE INTO $tbl t USING (
          |  SELECT c_custkey FROM $tbl WHERE c_custkey % 2 = 0
          |) src ON t.c_custkey = src.c_custkey
          |WHEN MATCHED THEN UPDATE SET c_acctbal = t.c_acctbal + 1.0
          |WHEN NOT MATCHED BY SOURCE AND t.c_nationkey < 10
          |  THEN DELETE
          |WHEN NOT MATCHED BY SOURCE
          |  THEN UPDATE SET c_acctbal = 0.0""".stripMargin)
        require(SnapshotTable.versions(s, path).max == 2,
          "each rich MERGE must land as exactly one manifest commit")
        s.table(tbl)
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("n"),
            sum(col("c_acctbal").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("bal_total"),
            sum(col("c_custkey")).as("key_total"))
          .orderBy(col("c_nationkey"))
      } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
    }),

    // W46: dynamic-partition INSERT OVERWRITE as a REAL verb
    // (round-17; was a refusal) — a partitioned orders table where
    // one SQL statement under partitionOverwriteMode=dynamic replaces
    // exactly the partition the data touches (URGENT orders, prices
    // negated — bit-exact, no fp-rounding drift vs the oracle) in ONE
    // commit; the untouched partitions' manifest
    // entries are require()-pinned VERBATIM (by-reference
    // pass-through, zero data I/O outside the touched partition) and
    // v0 stays time-travelable. Oracle: orders with URGENT halved.
    "w46_sql_dyn_overwrite" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w46").toString + "/orders_dyn"
      val orders = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      SnapshotTable.create(
        orders.repartitionByRange(4, col("o_orderkey"))
          .sortWithinPartitions(col("o_orderkey")),
        path, partitionBy = Seq("o_orderpriority"))
      val untouchedBefore = SnapshotTable.manifestEntries(s, path, 0)
        .filterNot(_.contains("1-URGENT")).toSet
      val tbl = "graft_w46_" + java.util.UUID.randomUUID()
        .toString.replace("-", "").take(8)
      s.sql(s"CREATE TABLE $tbl USING graft OPTIONS (path '$path')")
      val modeKey = "spark.sql.sources.partitionOverwriteMode"
      val prior = s.conf.getOption(modeKey)
      try {
        s.conf.set(modeKey, "dynamic")
        s.sql(s"INSERT OVERWRITE TABLE $tbl " +
          s"SELECT o_orderkey, o_orderpriority, -o_totalprice " +
          s"FROM $tbl WHERE o_orderpriority = '1-URGENT'")
        require(SnapshotTable.versions(s, path).max == 1,
          "dynamic partition overwrite must land as ONE commit")
        require(SnapshotTable.manifestEntries(s, path, 1)
            .filterNot(_.contains("1-URGENT")).toSet == untouchedBefore,
          "untouched partitions must pass through by reference")
        s.table(tbl)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("total"),
            sum(col("o_orderkey")).as("key_total"))
          .orderBy(col("o_orderpriority"))
      } finally {
        prior match {
          case Some(v) => s.conf.set(modeKey, v)
          case None => s.conf.unset(modeKey)
        }
        s.sql(s"DROP TABLE IF EXISTS $tbl")
      }
    }),

    // W47: MERGE WITH SCHEMA EVOLUTION through the rich path —
    // clause conditions + star evolution in one statement: matched
    // negative balances flip positive and gain the new `seg` column,
    // the rest of the matched slice deletes, shifted keys insert with
    // seg=3; untouched rows read the added column as NULL
    // (metadata-only evolution — zero old files rewritten). One
    // commit, require()-pinned. Oracle restates it over raw customer.
    "w47_sql_merge_evolve" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w47").toString + "/cust_ev"
      val cust = Tables(s, dir, "customer").select(
        col("c_custkey"), col("c_acctbal"))
      SnapshotTable.create(
        cust.repartitionByRange(4, col("c_custkey"))
          .sortWithinPartitions(col("c_custkey")), path)
      val tbl = "graft_w47_" + java.util.UUID.randomUUID()
        .toString.replace("-", "").take(8)
      s.sql(s"CREATE TABLE $tbl USING graft OPTIONS (path '$path')")
      try {
        s.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO $tbl t USING (
          |  SELECT c_custkey, -c_acctbal AS c_acctbal,
          |         CAST(c_custkey % 7 AS INT) AS seg
          |  FROM $tbl WHERE c_custkey % 4 = 0
          |  UNION ALL
          |  SELECT CAST(c_custkey + 10000000 AS BIGINT),
          |         CAST(5.0 AS DOUBLE), CAST(3 AS INT)
          |  FROM $tbl WHERE c_custkey % 500 = 2
          |) s ON t.c_custkey = s.c_custkey
          |WHEN MATCHED AND s.c_acctbal > t.c_acctbal
          |  THEN UPDATE SET *
          |WHEN MATCHED THEN DELETE
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        require(SnapshotTable.versions(s, path).max == 1,
          "the evolving merge must land as exactly one commit")
        require(s.table(tbl).columns.toSeq ==
            Seq("c_custkey", "c_acctbal", "seg"),
          "seg must ADD via schema evolution (catalog schema synced)")
        s.table(tbl)
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n"),
            sum(col("c_acctbal").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("bal_total"),
            sum(col("c_custkey")).as("key_total"))
          .orderBy(col("seg"))
      } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
    }),

    // W48: the SQL MAINTENANCE surface (round-17) — the injected
    // delegating parser's verbs driven end-to-end against one catalog
    // table: OPTIMIZE (incremental bin-pack, then a pinned NO-OP),
    // OPTIMIZE ZORDER BY, DESCRIBE HISTORY (op labels pinned),
    // VACUUM DRY RUN (deletes nothing — pinned), and RESTORE TABLE TO
    // VERSION AS OF undoing the DELETE. Maintenance commits are
    // relationally invisible by design, so the oracle restates only
    // the DATA statements (insert slice + conditional update) — the
    // DELETE is restored away — while the require()s pin the
    // maintenance mechanics the oracle cannot see.
    "w48_sql_maintenance" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w48").toString + "/orders_mt"
      val orders = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      // a fragmented start: 8 small files = OPTIMIZE has real work
      SnapshotTable.create(
        orders.filter(col("o_orderkey") % 3 === 0).repartition(8), path)
      val tbl = "graft_w48_" + java.util.UUID.randomUUID()
        .toString.replace("-", "").take(8)
      s.sql(s"CREATE TABLE $tbl USING graft OPTIONS (path '$path')")
      orders.filter(col("o_orderkey") % 3 === 1)
        .createOrReplaceTempView("w48_src")
      try {
        s.sql(s"INSERT INTO $tbl SELECT * FROM w48_src")
        s.sql(s"UPDATE $tbl SET o_totalprice = o_totalprice + 100000.0" +
          " WHERE o_custkey % 10 < 3")
        s.sql(s"DELETE FROM $tbl WHERE o_orderkey % 10 = 7")
        val opt = s.sql(s"OPTIMIZE $tbl").collect()
        require(!opt.head.isNullAt(2) && opt.head.getInt(2) == 4,
          "OPTIMIZE must commit the bin-pack as version 4")
        require(s.sql(s"OPTIMIZE $tbl").collect().head.isNullAt(2),
          "a second OPTIMIZE must NO-OP on the compacted table")
        s.sql(s"OPTIMIZE $tbl ZORDER BY (o_custkey)")
        val ops = s.sql(s"DESCRIBE HISTORY $tbl").collect()
          .map(_.getString(2)).toSeq
        require(ops == Seq("OPTIMIZE-ZORDER", "OPTIMIZE", "DELETE",
            "UPDATE-MOR", "APPEND", "CREATE"),
          s"history op labels drifted: $ops")
        val dry = s.sql(s"VACUUM $tbl RETAIN 2 VERSIONS DRY RUN")
          .collect().map(_.getInt(0)).toSeq
        require(dry == Seq(0, 1, 2, 3),
          s"VACUUM DRY RUN must report the droppable versions: $dry")
        require(SnapshotTable.versions(s, path) == Seq(0, 1, 2, 3, 4, 5),
          "DRY RUN must delete nothing")
        val res = s.sql(
          s"RESTORE TABLE $tbl TO VERSION AS OF 2").collect()
        require(res.head.getInt(2) == 6,
          "RESTORE must publish the pre-DELETE state as version 6")
        s.table(tbl)
          .groupBy((col("o_custkey") % 7).as("grp"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("price_total"),
            sum(col("o_orderkey")).as("key_total"))
          .orderBy(col("grp"))
      } finally {
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.catalog.dropTempView("w48_src")
      }
    }),

    // W49: SQL schema evolution (round-17) — ALTER TABLE ADD /
    // RENAME / widen / DROP COLUMN on a catalog table, interleaved
    // with DML over the evolved schema: the added column backfills
    // via UPDATE, the renamed column keeps its physical bytes (column
    // mapping), the widen is metadata-only, and the dropped column's
    // retirement leaves every remaining value intact. The oracle
    // restates the data effects; the require()s pin the evolution
    // mechanics (op labels, metadata-only-ness via file counts).
    "w49_sql_alter" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w49").toString + "/cust_ddl"
      val cust = Tables(s, dir, "customer").select(
        col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      SnapshotTable.create(
        cust.filter(col("c_custkey") % 2 === 0)
          .repartitionByRange(4, col("c_custkey"))
          .sortWithinPartitions(col("c_custkey")), path)
      val files0 = SnapshotTable.fileCount(s, path)
      val tbl = "graft_w49_" + java.util.UUID.randomUUID()
        .toString.replace("-", "").take(8)
      s.sql(s"CREATE TABLE $tbl USING graft OPTIONS (path '$path')")
      cust.filter(col("c_custkey") % 2 === 1)
        .createOrReplaceTempView("w49_src")
      try {
        s.sql(s"ALTER TABLE $tbl ADD COLUMNS (seg INT)")
        require(SnapshotTable.fileCount(s, path) == files0,
          "ADD COLUMNS must be metadata-only (zero files rewritten)")
        s.sql(s"INSERT INTO $tbl SELECT c_custkey, c_nationkey, " +
          "c_acctbal, CAST(c_nationkey % 5 AS INT) FROM w49_src")
        s.sql(s"UPDATE $tbl SET seg = CAST(c_custkey % 3 AS INT) " +
          "WHERE seg IS NULL")
        val filesPreDdl = SnapshotTable.fileCount(s, path)
        s.sql(s"ALTER TABLE $tbl RENAME COLUMN c_acctbal TO bal")
        s.sql(s"ALTER TABLE $tbl ALTER COLUMN seg TYPE BIGINT")
        s.sql(s"ALTER TABLE $tbl DROP COLUMN c_nationkey")
        require(SnapshotTable.fileCount(s, path) == filesPreDdl,
          "RENAME/widen/DROP must be metadata-only")
        val ops = s.sql(s"DESCRIBE HISTORY $tbl").collect()
          .map(_.getString(2)).toSeq
        require(ops == Seq("DROP-COLUMN", "WIDEN-COLUMN",
            "RENAME-COLUMN", "UPDATE-MOR", "APPEND", "ADD-COLUMNS",
            "CREATE"), s"history op labels drifted: $ops")
        require(s.table(tbl).columns.toSeq ==
            Seq("c_custkey", "bal", "seg"),
          "catalog schema must track the evolved reality")
        s.table(tbl)
          .groupBy(col("seg"))
          .agg(count(lit(1)).as("n"),
            sum(col("bal").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("bal_total"),
            sum(col("c_custkey")).as("key_total"))
          .orderBy(col("seg"))
      } finally {
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.catalog.dropTempView("w49_src")
      }
    }),

    // W50: CONVERT TO GRAFT (round-17) — a plain Hive-partitioned
    // parquet lake adopted IN PLACE (distributed footer harvest,
    // version 0 references the original files, zero bytes rewritten),
    // then immediately driven like any graft table: catalog
    // registration, a partition-pruned SQL DELETE, time travel back
    // to the adoption commit. The oracle restates the delete over raw
    // orders; the require()s pin the in-place mechanics.
    "w50_convert" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val base = java.nio.file.Files
        .createTempDirectory("graft_snap_w50").toString + "/lake"
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .coalesce(4)
        .write.partitionBy("o_orderpriority").parquet(base)
      val res = s.sql(s"CONVERT TO GRAFT parquet.`$base`").collect()
      require(res.head.getInt(1) == 0, "convert must publish version 0")
      require(SnapshotTable.manifestEntries(s, base, 0)
          .forall(e => e.split("\t")(0).startsWith("o_orderpriority=")),
        "version 0 must reference the ORIGINAL files in place")
      require(SnapshotTable.partitioning(s, base) ==
        Seq("o_orderpriority"), "inferred layout must be recorded")
      val tbl = "graft_w50_" + java.util.UUID.randomUUID()
        .toString.replace("-", "").take(8)
      s.sql(s"CREATE TABLE $tbl USING graft OPTIONS (path '$base')")
      try {
        s.sql(s"DELETE FROM $tbl WHERE o_orderkey % 10 = 3")
        require(s.sql(s"DESCRIBE HISTORY $tbl").collect()
            .map(_.getString(2)).toSeq == Seq("DELETE", "CONVERT"),
          "history must carry the adoption + the delete")
        // time travel to the adoption commit still reads everything
        require(s.sql(s"SELECT count(*) FROM $tbl VERSION AS OF 0")
            .head.getLong(0) > s.table(tbl).count(),
          "version 0 must still serve the pre-delete rows")
        s.table(tbl)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("price_total"),
            sum(col("o_orderkey")).as("key_total"))
          .orderBy(col("o_orderpriority"))
      } finally s.sql(s"DROP TABLE IF EXISTS $tbl")
    }),

    "w42_metadata_table" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w42").toString + "/orders_md"
      val orders = Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      SnapshotTable.create(
        orders.repartitionByRange(4, col("o_orderkey"))
          .sortWithinPartitions(col("o_orderkey")),
        path, partitionBy = Seq("o_orderpriority"))
      // CoW delete: straddling files REWRITE (metadata rows= shrink)
      SnapshotTable.delete(s, path, col("o_orderkey") % 10 === 3L)
      // MoR delete: rows MASK behind per-file DV blobs (rows= stays,
      // dv_positions carries the masked cardinality)
      SnapshotTable.deleteMoR(s, path, col("o_orderkey") % 10 === 7L)
      val md = SnapshotTable.metadataTable(s, path)
      require(md.filter(col("rows").isNull).count() == 0L,
        "metadata table lost exact row counts")
      require(md.filter(col("dv_positions").isNull).count() == 0L,
        "v2 blob refs must expose exact masked cardinalities")
      require(md.agg(sum((col("dv_positions") > 0L).cast("long")))
        .head().getLong(0) > 0L, "MoR delete left no DV footprint")
      md.groupBy(col("partition")("o_orderpriority")
          .as("o_orderpriority"))
        .agg((sum(col("rows")) - sum(col("dv_positions")))
          .cast(LongType).as("n_rows"))
        .orderBy(col("o_orderpriority"))
    }),

    // W23: z-order layout × manifest data skipping — orders laid out
    // along the (o_custkey, o_orderdate) z-curve into 32 snapshot
    // files, so BOTH dimensions' per-file min/max spans shrink
    // ~sqrt-wise and a conjunctive predicate on the two columns prunes
    // multiplicatively from the manifest alone (a 1-D sort would give
    // all the benefit to the leading key and none to the other). The
    // require() pins that the 2-D prune actually beats a broad scan.
    // Oracle: the same filter+aggregate over raw orders.
    "w23_zorder_skipping" -> ((s, dir) => {
      import graft.sources.{SnapshotTable, ZOrder}
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w23").toString + "/orders_z"
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"))
      SnapshotTable.create(
        ZOrder.zOrderBy(orders, Seq("o_custkey", "o_orderdate"), 32), path)
      val maxCust = orders.agg(max(col("o_custkey"))).head().getLong(0)
      val lo = to_timestamp(lit("1996-01-01 00:00:00"))
      val hi = to_timestamp(lit("1998-01-01 00:00:00"))
      val (pruned, kept, total) = SnapshotTable.readWherePruned(s, path,
        col("o_custkey") <= maxCust / 4 &&
          col("o_orderdate") >= lo && col("o_orderdate") < hi)
      require(kept * 2 < total,
        s"z-order skipping regressed: kept $kept of $total files")
      pruned
        .groupBy(date_trunc("year", col("o_orderdate")).cast(DateType)
          .as("year"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderkey")).as("first_key"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("total"))
        .orderBy(col("year"))
    }),

    // W24: incremental compaction as a graded lifecycle — the
    // streaming-ingest aftermath: a create plus four one-file appends
    // accumulate a small-file backlog, optimizeIncremental folds the
    // backlog into right-sized files as a NEW version (content
    // byte-identical, require()-pinned file-count drop), and every
    // version's aggregate stays frozen. Oracle: cumulative priority
    // slices; the compacted head repeats the last append's totals.
    "w24_compaction" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w24").toString + "/orders_snap"
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"))
      def slice(p: String) = orders.filter(col("o_orderpriority") === p)
      SnapshotTable.create(slice("1-URGENT").coalesce(1), path)
      Seq("2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        .foreach(p => SnapshotTable.append(slice(p).coalesce(1), path))
      val before = SnapshotTable.read(s, path).inputFiles.length
      SnapshotTable.optimizeIncremental(s, path,
          targetFileBytes = 512L * 1024 * 1024)
        .getOrElse(sys.error("compaction found no backlog"))
      val after = SnapshotTable.read(s, path).inputFiles.length
      require(after < before,
        s"compaction did not shrink the file set: $before -> $after")
      SnapshotTable.versions(s, path).map { v =>
        SnapshotTable.read(s, path, Some(v))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("total"))
          .withColumn("version", lit(v))
      }.reduce(_ unionByName _)
        .select(col("version"), col("n_rows"), col("total"))
        .orderBy(col("version"))
    }),

    // W25: merge-on-read DELETE via deletion vectors - the same
    // lifecycle as w17 but no data file is rewritten: each delete
    // commits a (file, pos) vector that readers anti-join, cumulative
    // across deletes (require() pins the data-file identity across
    // both versions). At 100 TB this turns a point delete from an
    // I/O event into a metadata event; compaction materializes the
    // mask later. Oracle: the same per-version filters, relationally.
    "w25_delete_mor" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w25").toString + "/orders_snap"
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
      SnapshotTable.create(
        orders.filter(col("o_orderpriority") === "1-URGENT")
          .repartitionByRange(4, col("o_orderkey")), path)
      val dataFiles = SnapshotTable.read(s, path).inputFiles.toSet
      SnapshotTable.deleteMoR(s, path, col("o_orderstatus") === "F")
      SnapshotTable.deleteMoR(s, path, col("o_totalprice") > 300000.0)
      SnapshotTable.deleteMoR(s, path, lit(false)) // no-op, no version
      val after = SnapshotTable.read(s, path).inputFiles.toSet
      require(dataFiles.subsetOf(after) &&
        (after -- dataFiles).size <= 2,
        "merge-on-read delete rewrote data files")
      SnapshotTable.versions(s, path).map { v =>
        SnapshotTable.read(s, path, Some(v))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("total"))
          .withColumn("version", lit(v))
      }.reduce(_ unionByName _)
        .select(col("version"), col("n_rows"), col("total"))
        .orderBy(col("version"))
    }),

    // W26: merge-on-read UPDATE then merge-on-read DELETE - SET..WHERE
    // doubles the finished orders' price via a coordinate vector plus
    // one new-images file (no data file rewritten), then the delete
    // masks the now-expensive rows; per-version aggregates replay both
    // relationally. The require() pins that the original data files
    // survive both commits untouched.
    "w26_update_mor" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w26").toString + "/orders_snap"
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
      SnapshotTable.create(
        orders.filter(col("o_orderpriority") === "1-URGENT")
          .repartitionByRange(4, col("o_orderkey")), path)
      val dataFiles = SnapshotTable.read(s, path).inputFiles.toSet
      SnapshotTable.updateMoR(s, path, col("o_orderstatus") === "F",
        Map("o_totalprice" -> (col("o_totalprice") * 2)))
      SnapshotTable.deleteMoR(s, path, col("o_totalprice") > 500000.0)
      val after = SnapshotTable.read(s, path).inputFiles.toSet
      require(dataFiles.subsetOf(after),
        "merge-on-read update/delete rewrote original data files")
      SnapshotTable.versions(s, path).map { v =>
        SnapshotTable.read(s, path, Some(v))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("total"))
          .withColumn("version", lit(v))
      }.reduce(_ unionByName _)
        .select(col("version"), col("n_rows"), col("total"))
        .orderBy(col("version"))
    }),

    // W27: the full deletion-vector MATERIALIZATION lifecycle — the
    // operational story of merge-on-read at 100 TB. Two MoR deletes
    // accumulate (file,pos) masks (no data file rewritten, reads pay
    // an anti-join tax), then incremental compaction rewrites exactly
    // the DV'd files: the require()s pin that (a) the post-optimize
    // manifest references ZERO vectors (read tax gone), (b) the
    // pre-optimize version still time-travels with its mask applied,
    // and (c) the original data files were actually replaced. Oracle
    // replays the four versions relationally (v3 = v2: compaction
    // never changes visible rows).
    "w27_dv_materialize" -> ((s, dir) => {
      import graft.sources.SnapshotTable
      val path = java.nio.file.Files
        .createTempDirectory("graft_snap_w27").toString + "/orders_snap"
      val orders = Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"), col("o_totalprice"))
      SnapshotTable.create(
        orders.filter(col("o_orderpriority") === "1-URGENT")
          .repartitionByRange(4, col("o_orderkey")), path)
      val before = SnapshotTable.read(s, path).inputFiles.toSet
      SnapshotTable.deleteMoR(s, path, col("o_orderstatus") === "F")
      SnapshotTable.deleteMoR(s, path, col("o_totalprice") > 300000.0)
      require(SnapshotTable.pendingDvEntries(s, path) > 0,
        "MoR deletes left no pending vectors")
      val maskedCount = SnapshotTable.read(s, path).count()
      val preV = SnapshotTable.versions(s, path).max
      SnapshotTable.optimizeIncremental(s, path,
          targetFileBytes = 512L * 1024 * 1024)
        .getOrElse(sys.error("compaction found no DV backlog"))
      require(SnapshotTable.pendingDvEntries(s, path) == 0,
        "post-optimize manifest still references deletion vectors")
      require(SnapshotTable.pendingDvEntries(s, path, Some(preV)) > 0 &&
        SnapshotTable.read(s, path, Some(preV)).count() == maskedCount,
        "pre-optimize version no longer time-travels with its mask")
      val after = SnapshotTable.read(s, path).inputFiles.toSet
      require(after.intersect(before).isEmpty,
        "compaction did not rewrite the DV'd data files")
      SnapshotTable.versions(s, path).map { v =>
        SnapshotTable.read(s, path, Some(v))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("o_totalprice").cast(DecimalType(18, 2)))
              .cast(DoubleType).as("total"))
          .withColumn("version", lit(v))
      }.reduce(_ unionByName _)
        .select(col("version"), col("n_rows"), col("total"))
        .orderBy(col("version"))
    }),

    // W22: exponential-decay smoothing (EWMA, alpha = 1/2) over each
    // user's event stream — the time-series smoother the panel family
    // lacked. Exact by construction: the value quantizes to integer
    // cents (floor — identical in both engines) and the 8-term
    // truncated decay uses integer weights 128..1, so the whole
    // recurrence is BIGINT arithmetic with zero float drift
    // (2^-8 truncation error would be sub-cent anyway). One shuffle on
    // the entity key; the 8 lags share one window frame.
    "w22_ewma_decay" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val ev = Tables(s, dir, "events")
        .withColumn("qv", floor(col("value") * 100).cast(LongType))
      val decayed = (0 to 7).map(i =>
        coalesce(lag(col("qv"), i).over(w), lit(0L)) * (1L << (7 - i)))
        .reduce(_ + _)
      ev.withColumn("ewma_units", decayed)
        .select(col("event_id"), col("ewma_units"))
        .orderBy(col("event_id"))
    })
  )

  /** Flagship (SURVEY.md §7.2): panel + spine + as-of + lag/diff/mean +
    * ffill + binary target. */
  def flagshipPanel(s: SparkSession, dir: String): DataFrame = {
    val dense = densePanel(s, dir)
    // time-series features (one shuffle on custkey, windows share it)
    val lagged = TimeOps.diff(
      TimeOps.lag_(dense, Seq("custkey"), "mois", Seq("amt"), 1),
      Seq("custkey"), "mois", Seq("amt"), 3)
    val w = Window.partitionBy(col("custkey"))
      .orderBy(ColumnOps.monthIndex(col("mois")))
      .rangeBetween(-11, Window.currentRow)
    val withMean = lagged.withColumn("amt_mean12m",
      sum(col("amt").cast(DecimalType(18, 2))).over(w).cast(DoubleType)
        / count(col("amt")).over(w))
    val filled = TimeOps.ffill(
      withMean.withColumn("amt_ffill", col("amt")),
      Seq("custkey"), "mois", Seq("amt_ffill"))
    // as-of enrichment: latest large-order snapshot ≤ 92 days back [J6]
    val snaps = Tables(s, dir, "orders")
      .filter(col("o_totalprice") > 100000)
      .groupBy(col("o_custkey").as("custkey"),
        col("o_orderdate").cast(DateType).as("d"))
      .agg(max(col("o_totalprice")).as("snap_price"))
    val enriched = AsOfJoin.mergeAsOf(
      filled.withColumn("d", col("mois")), snaps,
      on = "d", by = Seq("custkey"), toleranceDays = Some(92),
      direction = "backward")
    // binary target: "an event occurs within 3 months" [M11 analogue]
    val events = Tables(s, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).cast(DateType).as("last_f_date"))
    enriched.join(events, Seq("custkey"), "left")
      .withColumn("target",
        when(col("last_f_date").isNotNull
          && add_months(col("mois"), 3) >= col("last_f_date")
          && col("mois") <= col("last_f_date"), 1).otherwise(0))
      .select(col("custkey"), col("mois"), col("amt"), col("amt_lag1m"),
        col("amt_diff3m"), col("amt_mean12m"), col("amt_ffill"),
        col("snap_price"), col("target"))
      .orderBy(col("custkey"), col("mois"))
  }

  val oracles: Map[String, String] = Map(
    "w1_lag" -> (panelSql +
      """
        |SELECT custkey, mois, amt,
        |  lag(amt, 1) OVER (PARTITION BY custkey ORDER BY mois) AS amt_lag1m
        |FROM panel ORDER BY custkey, mois""".stripMargin),

    "w2_diff" -> (panelSql +
      """
        |SELECT custkey, mois, amt,
        |  amt - lag(amt, 3) OVER (PARTITION BY custkey ORDER BY mois) AS amt_diff3m
        |FROM panel ORDER BY custkey, mois""".stripMargin),

    "w3_moving_avg" -> (panelSql +
      """
        |SELECT custkey, mois, amt,
        |  CAST(sum(CAST(amt AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / count(amt) OVER w AS amt_mean5m
        |FROM panel
        |WINDOW w AS (PARTITION BY custkey
        |  ORDER BY (year(mois) * 12 + month(mois))
        |  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
        |ORDER BY custkey, mois""".stripMargin),

    "w4_fill" -> (denseSql +
      """
        |SELECT custkey, mois, amt,
        |  last_value(amt IGNORE NULLS) OVER (PARTITION BY custkey ORDER BY mois
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS amt_ffill,
        |  first_value(n_orders IGNORE NULLS) OVER (PARTITION BY custkey ORDER BY mois
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_bfill
        |FROM dense ORDER BY custkey, mois""".stripMargin),

    "w5_interpolate" -> (denseSql +
      """,
        |rn AS (SELECT *, row_number() OVER (PARTITION BY custkey ORDER BY mois) AS r
        |       FROM dense),
        |bounds AS (SELECT *,
        |  last_value(amt IGNORE NULLS) OVER wp AS prev_val,
        |  last_value(CASE WHEN amt IS NOT NULL THEN r END IGNORE NULLS) OVER wp AS prev_r,
        |  first_value(amt IGNORE NULLS) OVER wn AS next_val,
        |  first_value(CASE WHEN amt IS NOT NULL THEN r END IGNORE NULLS) OVER wn AS next_r
        |  FROM rn
        |  WINDOW wp AS (PARTITION BY custkey ORDER BY mois
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY custkey ORDER BY mois
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT custkey, mois, amt,
        |  CASE WHEN amt IS NULL
        |    THEN prev_val + (next_val - prev_val) * (r - prev_r) / (next_r - prev_r)
        |    ELSE amt END AS amt_interp
        |FROM bounds ORDER BY custkey, mois""".stripMargin),

    "w6_leastnull_dedup" ->
      """WITH t AS (
        |  SELECT l_orderkey, l_linenumber, l_discount, l_tax,
        |    CASE WHEN l_discount > 0.05 THEN l_discount END AS v1,
        |    CASE WHEN l_tax > 0.04 THEN l_tax END AS v2
        |  FROM lineitem),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_orderkey
        |    ORDER BY (CASE WHEN v1 IS NULL THEN 1 ELSE 0 END
        |      + CASE WHEN v2 IS NULL THEN 1 ELSE 0 END) ASC,
        |      l_linenumber ASC, l_discount ASC, l_tax ASC) AS rn
        |  FROM t)
        |SELECT l_orderkey, l_linenumber, v1, v2 FROM r WHERE rn = 1
        |ORDER BY l_orderkey""".stripMargin,

    "w7_latest_revision" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT *, max(l_linenumber) OVER (PARTITION BY l_orderkey) AS mx
        |  FROM lineitem)
        |WHERE l_linenumber = mx
        |ORDER BY l_orderkey""".stripMargin,

    "w8_interval_merge" ->
      """WITH iv AS (
        |  SELECT DISTINCT o_custkey AS custkey,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS date_debut,
        |    CAST(CAST(date_trunc('month', o_orderdate) AS DATE)
        |      + INTERVAL 2 MONTH AS DATE) AS date_fin
        |  FROM orders),
        |cm AS (SELECT *,
        |    max(date_fin) OVER (PARTITION BY custkey
        |      ORDER BY date_debut, date_fin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cummax
        |  FROM iv),
        |flagged AS (SELECT *,
        |    CASE WHEN date_debut > lag(cummax, 1)
        |      OVER (PARTITION BY custkey ORDER BY date_debut, date_fin)
        |    THEN 1 ELSE 0 END AS new_island
        |  FROM cm),
        |islands AS (SELECT *, sum(new_island) OVER (PARTITION BY custkey
        |    ORDER BY date_debut, date_fin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM flagged)
        |SELECT custkey, min(date_debut) AS date_debut, max(date_fin) AS date_fin
        |FROM islands GROUP BY custkey, island
        |ORDER BY custkey, date_debut""".stripMargin,

    "w9_cumulative" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS cum_amount,
        |  count(*) OVER w AS n_cum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "w13_scd2" ->
      """WITH src AS (
        |  SELECT o_custkey, o_orderpriority,
        |    CAST(o_orderdate AS DATE) AS odate, o_orderkey
        |  FROM orders),
        |chg AS (
        |  SELECT o_custkey, o_orderpriority, odate, o_orderkey FROM (
        |    SELECT *, lag(o_orderpriority) OVER
        |      (PARTITION BY o_custkey ORDER BY odate, o_orderkey) AS prev
        |    FROM src)
        |  WHERE prev IS DISTINCT FROM o_orderpriority)
        |SELECT o_custkey, o_orderpriority, odate AS valid_from,
        |  lead(odate) OVER w AS valid_to,
        |  lead(odate) OVER w IS NULL AS is_current
        |FROM chg
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY odate, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderpriority""".stripMargin,

    "w14_snapshot_table" ->
      """WITH v0 AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |v1 AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |SELECT 0 AS version, n_rows, total FROM v0
        |UNION ALL SELECT 1 AS version, n_rows, total FROM v1
        |UNION ALL SELECT 2 AS version, n_rows, total FROM v1
        |ORDER BY version""".stripMargin,

    "w15_snapshot_merge" ->
      """WITH v0 AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |merged AS (
        |  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders
        |    WHERE o_orderpriority = '1-URGENT' AND o_orderstatus <> 'F'
        |  UNION ALL
        |  SELECT CAST(o_totalprice * 2 AS DECIMAL(18,2)) AS p FROM orders
        |    WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders
        |    WHERE o_orderpriority = '2-HIGH'),
        |v1 AS (SELECT count(*) AS n_rows, CAST(sum(p) AS DOUBLE) AS total
        |  FROM merged)
        |SELECT 0 AS version, n_rows, total FROM v0
        |UNION ALL SELECT 1 AS version, n_rows, total FROM v1
        |ORDER BY version""".stripMargin,

    "w16_snapshot_changes" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |  o_totalprice * 2 AS o_totalprice, 'insert' AS change_type
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |  o_totalprice, 'insert' AS change_type
        |FROM orders WHERE o_orderpriority = '2-HIGH'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, o_orderpriority,
        |  o_totalprice, 'delete' AS change_type
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
        |ORDER BY change_type, o_orderkey""".stripMargin,

    "w17_snapshot_delete" ->
      """WITH v0 AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |v1 AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_orderstatus <> 'F')
        |SELECT 0 AS version, n_rows, total FROM v0
        |UNION ALL SELECT 1 AS version, n_rows, total FROM v1
        |ORDER BY version""".stripMargin,

    "w18_schema_evolution" ->
      """WITH t AS (
        |  SELECT o_orderpriority, CAST(NULL AS BIGINT) AS band
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderpriority,
        |    CAST(floor(o_totalprice / 100000.0) AS BIGINT) AS band
        |  FROM orders WHERE o_orderpriority = '2-HIGH')
        |SELECT o_orderpriority, count(*) AS n,
        |  count(CASE WHEN band IS NULL THEN 1 END) AS n_null_band,
        |  CAST(coalesce(sum(band), 0) AS BIGINT) AS band_total
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "w19_incremental_view" ->
      """WITH cents AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |merged AS (
        |  SELECT o_custkey, c FROM cents
        |    WHERE o_orderpriority = '1-URGENT' AND o_orderstatus <> 'F'
        |  UNION ALL
        |  SELECT o_custkey, c * 2 FROM cents
        |    WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_custkey, c FROM cents WHERE o_orderpriority = '2-HIGH'),
        |fin AS (SELECT * FROM merged WHERE o_custkey % 10 <> 3)
        |SELECT o_custkey, count(*) AS n, CAST(sum(c) AS BIGINT) AS total
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,

    "w33_dynamic_partition_pruning" ->
      """WITH dim AS (
        |  SELECT lang, count(*) AS n_docs,
        |    count(*) > (SELECT count(*) FROM documents) / 5.0 AS hot
        |  FROM documents GROUP BY 1)
        |SELECT f.lang, count(1) AS n_docs,
        |  CAST(sum(f.n_chars) AS BIGINT) AS chars
        |FROM documents f JOIN dim d ON f.lang = d.lang
        |WHERE d.hot
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "w34_catalyst_mor_mapping" ->
      """WITH live AS (SELECT * FROM documents WHERE doc_id % 7 <> 0),
        |dim AS (
        |  SELECT lang, count(*) AS n_docs,
        |    count(*) > (SELECT count(*) FROM documents) / 5.0 AS hot
        |  FROM documents GROUP BY 1)
        |SELECT f.lang, count(1) AS n_docs,
        |  CAST(sum(f.n_chars) AS BIGINT) AS chars
        |FROM live f JOIN dim d ON f.lang = d.lang
        |WHERE d.hot
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "w35_timestamp_partitions" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  count(1) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE date_trunc('year', o_orderdate) >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND date_trunc('year', o_orderdate) < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "w32_catalyst_fileindex" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  count(1) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "w31_bloom_skipping" ->
      """WITH mid AS (SELECT max(doc_id) // 2 AS m FROM documents),
        |t AS (SELECT max(doc_id) AS target FROM documents, mid
        |      WHERE doc_id <= m)
        |SELECT doc_id, lang, source, n_chars
        |FROM documents, t WHERE doc_id = target""".stripMargin,

    "w30_partition_zorder" ->
      """WITH mc AS (SELECT max(o_custkey) AS m FROM orders)
        |SELECT CAST(date_trunc('year', o_orderdate) AS DATE) AS year,
        |  count(*) AS n_orders,
        |  min(o_orderkey) AS first_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders, mc
        |WHERE o_orderpriority = '1-URGENT'
        |  AND o_custkey <= m // 4
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "w29_schema_rename_drop" ->
      """WITH c AS (SELECT o_orderkey, o_custkey, o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS pc
        |  FROM orders)
        |SELECT count(*) AS n_rows, CAST(sum(pc) AS BIGINT) AS total,
        |  count(CASE WHEN o_orderpriority = '3-MEDIUM'
        |             THEN o_custkey END) AS custkeys
        |FROM c
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')""".stripMargin,

    "w28_incremental_minmax" ->
      """WITH cents AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |merged AS (
        |  SELECT o_custkey, c FROM cents
        |    WHERE o_orderpriority = '1-URGENT' AND o_orderstatus <> 'F'
        |  UNION ALL
        |  SELECT o_custkey, c * 2 FROM cents
        |    WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_custkey, c FROM cents WHERE o_orderpriority = '2-HIGH'),
        |fin AS (SELECT * FROM merged WHERE c <= 25000000)
        |SELECT o_custkey, count(*) AS n, CAST(sum(c) AS BIGINT) AS total,
        |  CAST(min(c) AS BIGINT) AS mn, CAST(max(c) AS BIGINT) AS mx
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,

    "w37_segmented_manifest" ->
      """WITH m AS (SELECT max(o_orderkey) AS mx FROM orders
        |  WHERE o_orderpriority = '1-URGENT'),
        |t AS (SELECT o_orderkey, o_orderpriority, o_totalprice
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        |fin AS (SELECT f.* FROM t f, m
        |  WHERE f.o_orderkey < m.mx - m.mx // 50)
        |SELECT o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS total
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,

    "w40_datasource_roundtrip" ->
      """WITH t AS (SELECT o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
        |SELECT o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS total
        |FROM t WHERE cents > 10000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "w38_concurrent_merge" ->
      """WITH t AS (SELECT o_orderkey, o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders),
        |m AS (SELECT max(o_orderkey) AS mk FROM t),
        |fin AS (SELECT o_orderpriority,
        |    CASE WHEN o_orderkey <= mk // 10 THEN cents * 2
        |         WHEN o_orderkey >= mk - mk // 10 THEN cents * 3
        |         ELSE cents END AS c
        |  FROM t, m)
        |SELECT o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(c) AS BIGINT) AS total
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,

    "w39_merge_evolution" ->
      """WITH t AS (SELECT o_orderkey, o_orderpriority,
        |    o_orderkey % 100 AS qty,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    o_custkey
        |  FROM orders),
        |fin AS (
        |  SELECT qty, cents, CAST(NULL AS BIGINT) AS ck FROM t
        |    WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT qty, cents, o_custkey FROM t
        |    WHERE o_orderpriority IN ('2-HIGH', '3-MEDIUM'))
        |SELECT count(*) AS n_rows, CAST(sum(qty) AS BIGINT) AS qty_total,
        |  CAST(sum(cents) AS BIGINT) AS total, count(ck) AS with_cust
        |FROM fin""".stripMargin,

    "w36_pruned_minmax_rescan" ->
      """WITH cents AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |mc AS (SELECT max(o_custkey) AS m FROM cents
        |  WHERE o_orderpriority = '1-URGENT'),
        |merged AS (
        |  SELECT o_custkey, c FROM cents
        |    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        |fin AS (SELECT f.* FROM merged f, mc
        |  WHERE NOT (f.c > 20000000 AND f.o_custkey <= m // 5))
        |SELECT o_custkey, count(*) AS n, CAST(sum(c) AS BIGINT) AS total,
        |  CAST(min(c) AS BIGINT) AS mn, CAST(max(c) AS BIGINT) AS mx
        |FROM fin GROUP BY 1 ORDER BY 1""".stripMargin,

    "w20_partitioned_read" ->
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents
        |WHERE lang IN ('en', 'fr') AND n_chars >= 200
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "w21_data_skipping" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "w41_null_skipping" ->
      """SELECT o_orderpriority, count(*) AS n_null_cents
        |FROM orders
        |WHERE o_orderkey % 10 < 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // each lifecycle commit's change class restated from raw orders:
    // A = the CoW-deleted slice, B = the appended (shifted) slice;
    // the restore emits A back as inserts and retracts B
    "w43_restore_cdf" ->
      """WITH a AS (SELECT o_orderkey, o_totalprice FROM orders
        |           WHERE o_orderkey % 10 = 3),
        |b AS (SELECT o_orderkey + (SELECT max(o_orderkey) FROM orders)
        |        AS o_orderkey, o_totalprice
        |      FROM orders WHERE o_orderkey % 100 = 1)
        |SELECT * FROM (
        |  SELECT 1 AS _commit_version, 'delete' AS change_type,
        |    count(*) AS n,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total FROM a
        |  UNION ALL
        |  SELECT 2, 'insert', count(*),
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    FROM b
        |  UNION ALL
        |  SELECT 3, 'delete', count(*),
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    FROM b
        |  UNION ALL
        |  SELECT 3, 'insert', count(*),
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    FROM a
        |) ORDER BY _commit_version, change_type""".stripMargin,

    // the SQL statement sequence restated relationally: s0 = +insert,
    // s1 = -deleted slice, s2 = +1000 where nation<5 (the UPDATE),
    // s3 = %7 keys negated (the MERGE's matched arm over the s2
    // snapshot), ins = the MERGE's shifted not-matched inserts
    "w44_sql_dml" ->
      """WITH s0 AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        |  UNION ALL SELECT CAST(20000000 AS BIGINT),
        |    CAST(98 AS INT), CAST(7.25 AS DOUBLE)),
        |s1 AS (SELECT * FROM s0 WHERE c_custkey % 10 != 3),
        |s2 AS (SELECT c_custkey, c_nationkey,
        |         CASE WHEN c_nationkey < 5 THEN c_acctbal + 1000.0
        |              ELSE c_acctbal END AS bal
        |       FROM s1),
        |s3 AS (SELECT c_custkey, c_nationkey,
        |         CASE WHEN c_custkey % 7 = 0 THEN -bal ELSE bal END
        |           AS bal
        |       FROM s2),
        |ins AS (SELECT CAST(c_custkey + 10000000 AS BIGINT)
        |          AS c_custkey, CAST(99 AS INT) AS c_nationkey,
        |          CAST(5.0 AS DOUBLE) AS bal
        |        FROM s2 WHERE c_custkey % 500 = 1),
        |fin AS (SELECT * FROM s3 UNION ALL SELECT * FROM ins)
        |SELECT c_nationkey, count(*) AS n,
        |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS bal_total,
        |  CAST(sum(c_custkey) AS BIGINT) AS key_total
        |FROM fin GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    // the two rich MERGE statements restated relationally: s1 = the
    // conditional update-or-delete (matched %3 keys: doubled balance
    // wins above 1000 and shifts the nation key, else the row goes);
    // s2 = the sync (even keys +1, stale odd keys delete under
    // nation<10, zero otherwise)
    "w45_sql_merge_rich" ->
      """WITH s0 AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer),
        |m1 AS (SELECT c_custkey, c_acctbal * 2 AS newbal
        |       FROM s0 WHERE c_custkey % 3 = 0),
        |s1 AS (
        |  SELECT t.c_custkey,
        |    CASE WHEN m.c_custkey IS NOT NULL AND m.newbal > 1000.0
        |         THEN t.c_nationkey + 100 ELSE t.c_nationkey END
        |      AS c_nationkey,
        |    CASE WHEN m.c_custkey IS NOT NULL AND m.newbal > 1000.0
        |         THEN m.newbal ELSE t.c_acctbal END AS c_acctbal
        |  FROM s0 t LEFT JOIN m1 m ON t.c_custkey = m.c_custkey
        |  WHERE m.c_custkey IS NULL OR m.newbal > 1000.0),
        |s2 AS (
        |  SELECT c_custkey, c_nationkey,
        |    CASE WHEN c_custkey % 2 = 0 THEN c_acctbal + 1.0
        |         ELSE 0.0 END AS c_acctbal
        |  FROM s1 WHERE c_custkey % 2 = 0 OR c_nationkey >= 10)
        |SELECT c_nationkey, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS bal_total,
        |  CAST(sum(c_custkey) AS BIGINT) AS key_total
        |FROM s2 GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    // matched %4 keys: negated balance wins only when the original
    // was negative (else DELETE); untouched keys keep bal, seg null;
    // shifted keys insert with seg=3
    "w47_sql_merge_evolve" ->
      """WITH s0 AS (SELECT c_custkey, c_acctbal FROM customer),
        |upd AS (SELECT c_custkey, -c_acctbal AS c_acctbal,
        |          CAST(c_custkey % 7 AS INT) AS seg
        |        FROM s0
        |        WHERE c_custkey % 4 = 0 AND -c_acctbal > c_acctbal),
        |keep AS (SELECT c_custkey, c_acctbal, CAST(NULL AS INT) AS seg
        |         FROM s0 WHERE c_custkey % 4 <> 0),
        |ins AS (SELECT CAST(c_custkey + 10000000 AS BIGINT)
        |          AS c_custkey, CAST(5.0 AS DOUBLE) AS c_acctbal,
        |          CAST(3 AS INT) AS seg
        |        FROM s0 WHERE c_custkey % 500 = 2),
        |fin AS (SELECT * FROM upd UNION ALL SELECT * FROM keep
        |        UNION ALL SELECT * FROM ins)
        |SELECT seg, count(*) AS n,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |    AS bal_total,
        |  CAST(sum(c_custkey) AS BIGINT) AS key_total
        |FROM fin GROUP BY seg ORDER BY seg""".stripMargin,

    "w46_sql_dyn_overwrite" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(CASE WHEN o_orderpriority = '1-URGENT'
        |    THEN -o_totalprice ELSE o_totalprice END
        |    AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_total
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // maintenance commits are relationally invisible; the oracle
    // restates the DATA statements only — the insert slice and the
    // conditional update survive, the DELETE is restored away
    "w48_sql_maintenance" ->
      """WITH s0 AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |  WHERE o_orderkey % 3 IN (0, 1)),
        |s1 AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_custkey % 10 < 3 THEN o_totalprice + 100000.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM s0)
        |SELECT o_custkey % 7 AS grp, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS price_total,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_total
        |FROM s1 GROUP BY grp ORDER BY grp""".stripMargin,

    // evolution restated: even keys (created pre-evolution) backfill
    // seg = key % 3 via the UPDATE; odd keys (inserted post-ADD)
    // carry seg = nation % 5; rename/widen/drop change names and
    // types, never values — BIGINT seg matches the widen
    "w49_sql_alter" ->
      """WITH evens AS (
        |  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal,
        |    CAST(c_custkey % 3 AS BIGINT) AS seg
        |  FROM customer WHERE c_custkey % 2 = 0),
        |odds AS (
        |  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal,
        |    CAST(c_nationkey % 5 AS BIGINT) AS seg
        |  FROM customer WHERE c_custkey % 2 = 1),
        |fin AS (SELECT * FROM evens UNION ALL SELECT * FROM odds)
        |SELECT seg, count(*) AS n,
        |  CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS bal_total,
        |  CAST(sum(c_custkey) AS BIGINT) AS key_total
        |FROM fin GROUP BY seg ORDER BY seg""".stripMargin,

    "w50_convert" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS price_total,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_total
        |FROM orders WHERE o_orderkey % 10 <> 3
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "w42_metadata_table" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_rows
        |FROM orders
        |WHERE o_orderkey % 10 NOT IN (3, 7)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "w26_update_mor" ->
      """WITH u AS (SELECT o_orderkey,
        |    CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
        |         ELSE o_totalprice END AS p
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |v0 AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |v1 AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM u),
        |v2 AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM u WHERE p <= 500000.0)
        |SELECT 0 AS version, n_rows, total FROM v0
        |UNION ALL SELECT 1 AS version, n_rows, total FROM v1
        |UNION ALL SELECT 2 AS version, n_rows, total FROM v2
        |ORDER BY version""".stripMargin,

    "w27_dv_materialize" ->
      """WITH v0 AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |v1 AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_orderstatus <> 'F'),
        |v2 AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_orderstatus <> 'F'
        |    AND o_totalprice <= 300000.0)
        |SELECT 0 AS version, n_rows, total FROM v0
        |UNION ALL SELECT 1 AS version, n_rows, total FROM v1
        |UNION ALL SELECT 2 AS version, n_rows, total FROM v2
        |UNION ALL SELECT 3 AS version, n_rows, total FROM v2
        |ORDER BY version""".stripMargin,

    "w25_delete_mor" ->
      """WITH v0 AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total
        |  FROM orders WHERE o_orderpriority = '1-URGENT'),
        |v1 AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_orderstatus <> 'F'),
        |v2 AS (SELECT count(*) AS n_rows,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_orderstatus <> 'F'
        |    AND o_totalprice <= 300000.0)
        |SELECT 0 AS version, n_rows, total FROM v0
        |UNION ALL SELECT 1 AS version, n_rows, total FROM v1
        |UNION ALL SELECT 2 AS version, n_rows, total FROM v2
        |ORDER BY version""".stripMargin,

    "w24_compaction" ->
      """WITH p AS (SELECT o_totalprice, CASE o_orderpriority
        |    WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1
        |    WHEN '3-MEDIUM' THEN 2 WHEN '4-NOT SPECIFIED' THEN 3
        |    ELSE 4 END AS lvl FROM orders),
        |v AS (SELECT g.version, count(*) AS n_rows,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |      AS total
        |  FROM (SELECT unnest([0, 1, 2, 3, 4]) AS version) g
        |  JOIN p ON p.lvl <= g.version
        |  GROUP BY g.version)
        |SELECT version, n_rows, total FROM v
        |UNION ALL
        |SELECT 5 AS version, n_rows, total FROM v WHERE version = 4
        |ORDER BY version""".stripMargin,

    "w23_zorder_skipping" ->
      """WITH mc AS (SELECT max(o_custkey) AS m FROM orders)
        |SELECT CAST(date_trunc('year', o_orderdate) AS DATE) AS year,
        |  count(*) AS n_orders,
        |  min(o_orderkey) AS first_key,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders, mc
        |WHERE o_custkey <= m // 4
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "w22_ewma_decay" ->
      """WITH q AS (
        |  SELECT event_id, user_id, ts,
        |    CAST(floor(value * 100) AS BIGINT) AS qv
        |  FROM events)
        |SELECT event_id,
        |  CAST(coalesce(qv, 0) * 128
        |    + coalesce(lag(qv, 1) OVER w, 0) * 64
        |    + coalesce(lag(qv, 2) OVER w, 0) * 32
        |    + coalesce(lag(qv, 3) OVER w, 0) * 16
        |    + coalesce(lag(qv, 4) OVER w, 0) * 8
        |    + coalesce(lag(qv, 5) OVER w, 0) * 4
        |    + coalesce(lag(qv, 6) OVER w, 0) * 2
        |    + coalesce(lag(qv, 7) OVER w, 0) AS BIGINT) AS ewma_units
        |FROM q
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "flagship_panel" -> (denseSql +
      """,
        |feat AS (SELECT custkey, mois, amt,
        |    lag(amt, 1) OVER wo AS amt_lag1m,
        |    amt - lag(amt, 3) OVER wo AS amt_diff3m,
        |    CAST(sum(CAST(amt AS DECIMAL(18,2))) OVER wr AS DOUBLE)
        |      / count(amt) OVER wr AS amt_mean12m,
        |    last_value(amt IGNORE NULLS) OVER (PARTITION BY custkey ORDER BY mois
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS amt_ffill
        |  FROM dense
        |  WINDOW wo AS (PARTITION BY custkey ORDER BY mois),
        |  wr AS (PARTITION BY custkey ORDER BY (year(mois) * 12 + month(mois))
        |    RANGE BETWEEN 11 PRECEDING AND CURRENT ROW)),
        |snaps AS (SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS d,
        |    max(o_totalprice) AS snap_price
        |  FROM orders WHERE o_totalprice > 100000 GROUP BY 1, 2),
        |enriched AS (SELECT f.*,
        |    CASE WHEN s.d IS NOT NULL AND datediff('day', s.d, f.mois) <= 92
        |      THEN s.snap_price END AS snap_price
        |  FROM feat f ASOF LEFT JOIN snaps s
        |    ON f.custkey = s.custkey AND f.mois >= s.d),
        |ev AS (SELECT o_custkey AS custkey, CAST(max(o_orderdate) AS DATE) AS last_f_date
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1)
        |SELECT e.custkey, e.mois, e.amt, e.amt_lag1m, e.amt_diff3m,
        |  e.amt_mean12m, e.amt_ffill, e.snap_price,
        |  CASE WHEN ev.last_f_date IS NOT NULL
        |    AND CAST(e.mois + INTERVAL 3 MONTH AS DATE) >= ev.last_f_date
        |    AND e.mois <= ev.last_f_date THEN 1 ELSE 0 END AS target
        |FROM enriched e LEFT JOIN ev USING (custkey)
        |ORDER BY e.custkey, e.mois""".stripMargin)
  )
}
