package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Queries over the `events` stream table (batch forms of the streaming
  * surface — tumbling windows, sessionization, JSON props).
  *
  * `Tables` normalizes `ts` to an epoch-NANOSECOND long whatever the
  * parquet physically stored (the generator has shipped both int64-ns
  * and timestamp[us] across regenerations), so every query below does
  * exact integer arithmetic on ns longs — DuckDB mirrors via the
  * equally encoding-polymorphic epoch_ns()/epoch_us().
  */
object EventQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  private val NsPerHour = 3600L * 1000000000L
  private val SessionGapNs = 30L * 60L * 1000000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling 1-hour windows per event type (batch form of the
    // Structured Streaming windowedCounts)
    "e1_hourly_windows" -> ((s, dir) => {
      events(s, dir)
        .withColumn("hour_id", expr(s"ts div $NsPerHour"))
        .groupBy(col("hour_id"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("total"))
        .orderBy(col("hour_id"), col("event_type"))
    }),

    // gaps-and-islands sessionization: a >30-minute quiet gap starts a
    // new session (batch analogue of Streaming.sessionize)
    "e2_sessions" -> ((s, dir) => {
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        // us resolution on both sides: DuckDB's TIMESTAMP truncates the
        // parquet ns values to us on read
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("new_session",
          when(col("ts_us") - lag(col("ts_us"), 1).over(wOrd) > SessionGapNs / 1000, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts_us")).as("session_start"),
          max(col("ts_us")).as("session_end"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("total_value"))
        .orderBy(col("user_id"), col("session_id"))
    }),

    // sliding 1-hour windows every 30 minutes via Spark's NATIVE
    // window() generator (each event expands to size/slide = 2 window
    // rows inside the scan stage — no self-join); output keyed by the
    // window start in epoch µs. The ns longs are truncated to µs first
    // (same resolution contract as e2: DuckDB reads the parquet ns
    // timestamps as µs).
    "e4_sliding_windows" -> ((s, dir) => {
      events(s, dir)
        .withColumn("tsx", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("tsx"), "1 hour", "30 minutes"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("total"))
        .select(unix_micros(col("window.start")).as("win_start"),
          col("event_type"), col("n"), col("total"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    // ordered funnel view→click→purchase: each stage keeps the
    // earliest event at-or-after the previous stage's timestamp.
    // SINGLE-SCAN fold (r6): one pass over the events with the type
    // filter pruned at the scan, ONE user_id shuffle into a per-user
    // (ts, step)-sorted struct array, chained earliest-at-or-after
    // semantics as a codegen'd aggregate fold — parity-gated against
    // the staged multi-pass form the oracle's CTEs replay. A
    // pathologically hot user can be bounded with the
    // preThinPerEntityType guard (exact under the cap).
    "e5_funnel" -> ((s, dir) => {
      val e = events(s, dir).withColumn("ts_us", expr("ts div 1000"))
        .select(col("user_id"), col("event_type"), col("ts_us"))
      graft.operators.Aggregates
        .funnel(e, "user_id", "event_type", "ts_us",
          Seq("view", "click", "purchase"))
        .select(col("user_id"), col("t_0").as("t_view"),
          col("t_1").as("t_click"), col("t_2").as("t_purchase"),
          col("stage"))
        .orderBy(col("user_id"))
    }),

    // E12: the windowed funnel — same single-scan fold as e5 but each
    // step must convert within 24 hours of the previous step (the
    // product-analytics conversion-window semantics; 24h yields a
    // mixed 90/35/25 stage distribution on this corpus — both the
    // convert and the stall arm provably fire); the oracle replays
    // the staged CTEs with the same inclusive gap bound
    // E13: time-to-convert distribution — exact percentiles of
    // (first purchase − first view) over fully-converted funnel
    // users, from the same single-scan funnel fold as e5. Exact
    // cross-engine: integer µs delays, interpolated percentile
    // agrees bit-for-bit with DuckDB quantile_cont (the a8 recipe).
    "e13_conversion_delay" -> ((s, dir) => {
      val e = events(s, dir).withColumn("ts_us", expr("ts div 1000"))
        .select(col("user_id"), col("event_type"), col("ts_us"))
      graft.operators.Aggregates
        .funnel(e, "user_id", "event_type", "ts_us",
          Seq("view", "click", "purchase"))
        .filter(col("t_2").isNotNull)
        .select((col("t_2") - col("t_0")).as("delay_us"))
        .agg(count(lit(1)).as("n_converted"),
          expr("percentile(delay_us, 0.25)").as("q25"),
          expr("percentile(delay_us, 0.5)").as("q50"),
          expr("percentile(delay_us, 0.75)").as("q75"),
          expr("percentile(delay_us, 0.9)").as("q90"))
    }),

    "e12_funnel_windowed" -> ((s, dir) => {
      val e = events(s, dir).withColumn("ts_us", expr("ts div 1000"))
        .select(col("user_id"), col("event_type"), col("ts_us"))
      graft.operators.Aggregates
        .funnel(e, "user_id", "event_type", "ts_us",
          Seq("view", "click", "purchase"),
          maxStepGap = Some(24L * 3600L * 1000000L))
        .select(col("user_id"), col("t_0").as("t_view"),
          col("t_1").as("t_click"), col("t_2").as("t_purchase"),
          col("stage"))
        .orderBy(col("user_id"))
    }),

    // E6/A16: per-type z-score outlier flags — the numeric data-quality
    // scan of a curation pipeline. Group stats come from EXACT decimal
    // sums (order-independent, so Spark's parallel agg and the oracle's
    // sequential one agree bit-for-bit), are converted to double ONCE,
    // and every later double op appears in the same order in both
    // engines. The O(#types)-row stats frame broadcasts; the filter
    // compares squared deviation against 4*variance (no sqrt on the
    // decision path), so the flag set is deterministic.
    "e6_outlier_flags" -> ((s, dir) => {
      val e = events(s, dir)
        .select(col("event_id"), col("event_type"), col("value"))
      val dec = col("value").cast(DecimalType(18, 2))
      val stats = e.groupBy(col("event_type"))
        .agg(sum(dec).as("sxd"), sum(dec * dec).as("sxxd"),
          count(lit(1)).as("n"))
        .select(col("event_type"),
          (col("sxd").cast(DoubleType) / col("n")).as("mean_v"),
          ((col("sxxd").cast(DoubleType) -
            col("sxd").cast(DoubleType) * col("sxd").cast(DoubleType) / col("n"))
            / (col("n") - 1)).as("var_v"))
      val dev = col("value") - col("mean_v")
      e.join(broadcast(stats), "event_type")
        .filter(dev * dev > lit(4.0) * col("var_v"))
        .select(col("event_id"), col("event_type"), col("value"),
          round(dev / sqrt(col("var_v")), 6).as("z"))
        .orderBy(col("event_id"))
    }),

    // monthly active users: exact COUNT(DISTINCT) per group — the
    // expand-plan aggregate family (Spark rewrites the mixed
    // distinct/plain agg into Expand + two-phase aggregation; the
    // distinct key shuffle is (month, type, user), so cardinality is
    // bounded by actives, not events). a11 is the sketch path for the
    // same question at 100 TB; this is the exact path.
    "e7_mau" -> ((s, dir) => {
      events(s, dir)
        .withColumn("month_id", expr(s"ts div ${30L * 24 * NsPerHour}"))
        .groupBy(col("month_id"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("mau"),
          count(lit(1)).as("n_events"))
        .orderBy(col("month_id"), col("event_type"))
    }),

    // retention cohorts: cohort month = each user's first active month;
    // for every (cohort, activity month) the fraction of the cohort
    // still active — the classic product-analytics triangle. Scale
    // shape: one distinct on (user, month) — cardinality bounded by
    // actives — then a per-user min and user-keyed joins that co-locate
    // with it; cohort sizes are an O(#months) broadcast. The rate
    // divides longs as doubles and rounds to 6 places (identical op
    // order in the oracle, so exact).
    "e8_retention" -> ((s, dir) => {
      val monthNs = 30L * 24 * NsPerHour
      val am = events(s, dir)
        .withColumn("month_id", expr(s"ts div $monthNs"))
        .select(col("user_id"), col("month_id")).distinct()
      val cohort = am.groupBy(col("user_id"))
        .agg(min(col("month_id")).as("cohort_month"))
      val sizes = cohort.groupBy(col("cohort_month"))
        .agg(count(lit(1)).as("cohort_size"))
      am.join(cohort, "user_id")
        .groupBy(col("cohort_month"), col("month_id"))
        .agg(count(lit(1)).as("active_users"))
        .join(broadcast(sizes), "cohort_month")
        .select(col("cohort_month"),
          (col("month_id") - col("cohort_month")).as("months_since"),
          col("active_users"), col("cohort_size"),
          round(col("active_users").cast(DoubleType) / col("cohort_size"), 6)
            .as("retention"))
        .orderBy(col("cohort_month"), col("months_since"))
    }),

    // top-3 spenders per event type via the AGGREGATE top-k shape
    // (max_by-array): totals are pre-reduced per (type, user) — exact
    // decimal sums — so the collect_list state is bounded by distinct
    // users per type, not raw events; the per-group sorted slice then
    // replaces a second full-sort window. Ties break on user_id asc in
    // both engines.
    "e9_top_spenders" -> ((s, dir) => {
      val totals = events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).as("total"))
      totals.groupBy(col("event_type"))
        .agg(slice(array_sort(
          collect_list(struct(col("total"), col("user_id"))),
          (a, b) => when(a("total") > b("total"), -1)
            .when(a("total") < b("total"), 1)
            .when(a("user_id") < b("user_id"), -1)
            .when(a("user_id") > b("user_id"), 1)
            .otherwise(0)), 1, 3).as("top"))
        .select(col("event_type"), posexplode(col("top")).as(Seq("r", "e")))
        .select(col("event_type"), (col("r") + 1).cast(LongType).as("rank"),
          col("e.user_id").as("user_id"),
          col("e.total").cast(DoubleType).as("total"))
        .orderBy(col("event_type"), col("rank"))
    }),

    // e10: audience-overlap estimate (viewers ∩ purchasers) via the KMV
    // theta-sketch idiom — distinct-intersection without shuffling
    // either key set (≤ k longs per side through one map-side-combined
    // aggregate, no join); deterministic md5 hashes give it an exact
    // SQL oracle despite being an approximation
    "e10_kmv_overlap" -> ((s, dir) => {
      val ev = events(s, dir)
      graft.operators.Sketches.kmvOverlap(
        ev.filter(col("event_type") === "view").select(col("user_id")),
        col("user_id"),
        ev.filter(col("event_type") === "purchase").select(col("user_id")),
        col("user_id"),
        k = 256)
    }),

    // E11: last-touch attribution — every purchase attributed to the
    // same user's most recent non-purchase event within 30 minutes,
    // via the NATIVE as-of operator (one co-partitioning exchange per
    // side, merge scan with O(1) state — never a window buffering the
    // user's event list). The touch side pre-aggregates to one row per
    // (user, ts) with a deterministic arg-max tie-break, making the
    // as-of right side unique per (by, on) as the operator requires;
    // DuckDB replays with its own ASOF LEFT JOIN.
    "e11_attribution" -> ((s, dir) => {
      val e = events(s, dir).withColumn("ts_us", expr("ts div 1000"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
      // one user_id shuffle serves BOTH the (user, ts) aggregate
      // (hash(user) clusters every finer key) and the as-of join's
      // ClusteredDistribution(user_id) — without it the aggregate
      // shuffles on (user, ts) and the join must re-shuffle on user
      val touches = e.filter(col("event_type") =!= "purchase")
        .repartition(col("user_id"))
        .groupBy(col("user_id"), col("ts_us"))
        .agg(expr("max_by(event_type, event_id)").as("src_type"))
      graft.operators.AsOfJoin.mergeAsOfNative(purchases, touches,
          "ts_us", Seq("user_id"),
          toleranceDays = Some(1800000000), // raw µs for long on-cols
          direction = "backward")
        .select(col("event_id"), col("user_id"), col("value"),
          col("src_type"))
        .orderBy(col("event_id"))
    }),

    // JSON property extraction + aggregation (scalar JSON family)
    // E14: schema-first JSON — from_json over the STORED props column
    // with an explicit StructType (the production path when the
    // payload schema is known: ONE typed parse the optimizer prunes,
    // vs e3's per-field get_json_object probing), then an array
    // explode over values derived from the parsed field. Built
    // deliberately on stored JSON: a to_json/from_json round-trip
    // would be collapsed away by OptimizeJsonExprs and grade nothing
    // (caught in the plan audit). Integer arithmetic keeps the oracle
    // exact.
    "e14_json_explode" -> ((s, dir) => {
      val propsSchema = StructType(Seq(StructField("k", IntegerType)))
      events(s, dir)
        .select(col("event_type"),
          from_json(col("props"), propsSchema).getField("k")
            .cast(LongType).as("k"))
        .select(col("event_type"),
          explode(array(col("k"), col("k") * 2, col("k") + 100)).as("v"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("total"))
        .orderBy(col("event_type"))
    }),

    "e3_json_props" -> ((s, dir) => {
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
        .groupBy(col("event_type"))
        .agg(count(when(col("k") > 50, 1)).as("n_high"),
          sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    "e11_attribution" ->
      """WITH e AS (SELECT event_id, user_id, event_type, value,
        |    epoch_us(ts) AS ts_us FROM events),
        |p AS (SELECT event_id, user_id, value, ts_us FROM e
        |  WHERE event_type = 'purchase'),
        |s AS (SELECT user_id, ts_us,
        |    arg_max(event_type, event_id) AS src_type
        |  FROM e WHERE event_type <> 'purchase' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, p.value,
        |  CASE WHEN s.ts_us IS NOT NULL AND p.ts_us - s.ts_us <= 1800000000
        |    THEN s.src_type END AS src_type
        |FROM p ASOF LEFT JOIN s
        |  ON p.user_id = s.user_id AND s.ts_us <= p.ts_us
        |ORDER BY p.event_id""".stripMargin,

    "e1_hourly_windows" ->
      """SELECT epoch_ns(ts) // 3600000000000 AS hour_id,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e2_sessions" ->
      """WITH t AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
        |  FROM events),
        |flagged AS (SELECT *,
        |    CASE WHEN ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
        |      ELSE 0 END AS new_session
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |sessions AS (SELECT *,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, min(ts_us) AS session_start,
        |  max(ts_us) AS session_end, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM sessions GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e4_sliding_windows" ->
      """WITH e AS (SELECT epoch_ns(ts) // 1000 AS tus, event_type, value
        |  FROM events),
        |w AS (SELECT (tus // 1800000000 - o) * 1800000000 AS win_start,
        |    event_type, value
        |  FROM e CROSS JOIN (VALUES (0), (1)) AS t(o))
        |SELECT win_start, event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e5_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |v AS (SELECT user_id, min(ts_us) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts_us) AS t_click FROM e
        |  JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND ts_us >= t_view GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts_us) AS t_purchase FROM e
        |  JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND ts_us >= t_click GROUP BY 1)
        |SELECT v.user_id, t_view, t_click, t_purchase,
        |  CAST(1 + CASE WHEN t_click IS NULL THEN 0 ELSE 1 END
        |    + CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END AS INTEGER) AS stage
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "e13_conversion_delay" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |v AS (SELECT user_id, min(ts_us) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts_us) AS t_click FROM e
        |  JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND ts_us >= t_view GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts_us) AS t_purchase FROM e
        |  JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND ts_us >= t_click GROUP BY 1),
        |d AS (SELECT t_purchase - t_view AS delay_us
        |  FROM v JOIN c USING (user_id) JOIN p USING (user_id))
        |SELECT count(*) AS n_converted,
        |  quantile_cont(delay_us, 0.25) AS q25,
        |  quantile_cont(delay_us, 0.5) AS q50,
        |  quantile_cont(delay_us, 0.75) AS q75,
        |  quantile_cont(delay_us, 0.9) AS q90
        |FROM d""".stripMargin,

    "e12_funnel_windowed" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |v AS (SELECT user_id, min(ts_us) AS t_view FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(ts_us) AS t_click FROM e
        |  JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND ts_us >= t_view
        |    AND ts_us <= t_view + 86400000000 GROUP BY 1),
        |p AS (SELECT e.user_id, min(ts_us) AS t_purchase FROM e
        |  JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND ts_us >= t_click
        |    AND ts_us <= t_click + 86400000000 GROUP BY 1)
        |SELECT v.user_id, t_view, t_click, t_purchase,
        |  CAST(1 + CASE WHEN t_click IS NULL THEN 0 ELSE 1 END
        |    + CASE WHEN t_purchase IS NULL THEN 0 ELSE 1 END AS INTEGER) AS stage
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin,

    "e6_outlier_flags" ->
      """WITH st AS (SELECT event_type,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(value AS DECIMAL(18,2)) *
        |      CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
        |    count(*) AS n
        |  FROM events GROUP BY 1),
        |m AS (SELECT event_type, sx / n AS mean_v,
        |    (sxx - sx * sx / n) / (n - 1) AS var_v FROM st)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - mean_v) / sqrt(var_v), 6) AS z
        |FROM events e JOIN m USING (event_type)
        |WHERE (e.value - mean_v) * (e.value - mean_v) > 4 * var_v
        |ORDER BY event_id""".stripMargin,

    "e7_mau" ->
      """SELECT epoch_ns(ts) // 2592000000000000 AS month_id, event_type,
        |  count(DISTINCT user_id) AS mau, count(*) AS n_events
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "e8_retention" ->
      """WITH am AS (SELECT DISTINCT user_id,
        |    epoch_ns(ts) // 2592000000000000 AS month_id FROM events),
        |cohort AS (SELECT user_id, min(month_id) AS cohort_month
        |  FROM am GROUP BY 1),
        |sizes AS (SELECT cohort_month, count(*) AS cohort_size
        |  FROM cohort GROUP BY 1),
        |act AS (SELECT cohort_month, month_id, count(*) AS active_users
        |  FROM am JOIN cohort USING (user_id) GROUP BY 1, 2)
        |SELECT cohort_month, month_id - cohort_month AS months_since,
        |  active_users, cohort_size,
        |  round(CAST(active_users AS DOUBLE) / cohort_size, 6) AS retention
        |FROM act JOIN sizes USING (cohort_month)
        |ORDER BY cohort_month, months_since""".stripMargin,

    "e9_top_spenders" ->
      """WITH totals AS (SELECT event_type, user_id,
        |    sum(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, user_id, CAST(total AS DOUBLE) AS total,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY total DESC, user_id ASC) AS rank
        |  FROM totals)
        |SELECT event_type, rank, user_id, total FROM r
        |WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin,

    // Replays the theta-sketch estimate: bottom-256 distinct hashes per
    // side, θ = 256th smallest of their union, c = intersection members
    // ≤ θ; the estimator arithmetic repeats the Spark op order exactly
    // (two divisions then a product — 2^60 in E-notation so DuckDB
    // types it DOUBLE)
    "e10_kmv_overlap" ->
      """WITH ka AS (
        |  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM events WHERE event_type = 'view' ORDER BY hv LIMIT 256),
        |kb AS (
        |  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM events WHERE event_type = 'purchase' ORDER BY hv LIMIT 256),
        |u AS (SELECT hv FROM (SELECT hv FROM ka UNION SELECT hv FROM kb)
        |  ORDER BY hv LIMIT 256),
        |s AS (SELECT count(*) AS ku, max(hv) AS theta FROM u),
        |cx AS (SELECT count(*) AS c FROM ka, kb, s
        |  WHERE ka.hv = kb.hv AND ka.hv <= s.theta)
        |SELECT
        |  CASE WHEN s.ku < 256 THEN CAST(s.ku AS DOUBLE)
        |       ELSE 255 * 1.152921504606846976e18 / s.theta END AS est_union,
        |  CASE WHEN s.ku < 256 THEN CAST(cx.c AS DOUBLE)
        |       ELSE (CAST(cx.c AS DOUBLE) / s.ku)
        |         * (255 * 1.152921504606846976e18 / s.theta) END AS est_intersection,
        |  CAST(cx.c AS DOUBLE) / s.ku AS est_jaccard
        |FROM s, cx""".stripMargin,

    "e14_json_explode" ->
      """WITH k AS (SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events),
        |x AS (SELECT event_type, v FROM (
        |  SELECT event_type, k AS v FROM k
        |  UNION ALL SELECT event_type, k * 2 FROM k
        |  UNION ALL SELECT event_type, k + 100 FROM k))
        |SELECT event_type, count(*) AS n, CAST(sum(v) AS BIGINT) AS total
        |FROM x GROUP BY 1 ORDER BY 1""".stripMargin,

    "e3_json_props" ->
      """SELECT event_type,
        |  count(CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
        |    THEN 1 END) AS n_high,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
