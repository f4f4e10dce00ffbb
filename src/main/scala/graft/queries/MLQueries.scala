package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** SQL-expressible slices of the reference's ML surface (SURVEY.md §2.11).
  * The stochastic/estimator parts (resampler, split, classifiers, SHAP)
  * are covered by ScalaTest; here we oracle the deterministic pieces:
  * target labelling (M11) and threshold metrics (M14) over a fixed
  * rule-based score.
  */
object MLQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // M11 TargetVariable: label = 1 iff an "event" (first F-status order)
    // occurs within 3 months after the panel month; null event → 0
    // (reference transform.py:846-894)
    "m11_target" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val panel = o.groupBy(col("o_custkey").as("custkey"),
          date_trunc("month", col("o_orderdate")).cast(DateType).as("mois"))
        .agg(count(lit(1)).as("n_orders"))
      val events = o.filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(min(col("o_orderdate")).cast(DateType).as("event_date"))
      panel.join(events, Seq("custkey"), "left")
        .withColumn("target",
          when(col("event_date").isNotNull
            && add_months(col("mois"), 3) >= col("event_date"), 1)
            .otherwise(0))
        .select(col("custkey"), col("mois"), col("n_orders"), col("target"))
        .orderBy(col("custkey"), col("mois"))
    }),

    // M14 evaluation: confusion-matrix counts over a threshold sweep for
    // a deterministic rule-based score (price percentile as "probability")
    "m14_threshold_metrics" -> ((s, dir) => {
      // single scan: explode the threshold grid per row (9 rows out per
      // order), then one hash aggregate — no unioned re-scans
      Tables(s, dir, "orders")
        .select(
          when(col("o_orderstatus") === "F", 1).otherwise(0).as("label"),
          (col("o_totalprice") / lit(500000.0)).as("score"),
          explode(typedLit((1 to 9).map(_ / 10.0))).as("threshold"))
        .groupBy(col("threshold"))
        .agg(
          count(when(col("score") >= col("threshold")
            && col("label") === 1, 1)).as("tp"),
          count(when(col("score") >= col("threshold")
            && col("label") === 0, 1)).as("fp"),
          count(when(col("score") < col("threshold")
            && col("label") === 1, 1)).as("fn"),
          count(when(col("score") < col("threshold")
            && col("label") === 0, 1)).as("tn"))
        .orderBy(col("threshold"))
    }),

    // M16: calibration / reliability bins over the same fixed
    // rule-based score as m14 — decile bins of the score, per bin the
    // count, positive count, exact-decimal mean score and observed
    // positive rate (the reliability-diagram table; ECE is one more
    // weighted sum over it). Averages are computed as single
    // divisions of exact aggregates (decimal price sum, integer
    // counts), so the doubles are bit-identical across engines —
    // no float-accumulation order to diverge.
    "m16_calibration" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(
          when(col("o_orderstatus") === "F", 1L).otherwise(0L)
            .as("label"),
          col("o_totalprice"),
          least(floor(col("o_totalprice") / 50000.0).cast(LongType),
            lit(9L)).as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(col("label")).as("pos"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("psum"))
        .select(col("bin"), col("n"), col("pos"),
          (col("psum") / 500000.0 / col("n")).as("mean_score"),
          (col("pos").cast(DoubleType) / col("n")).as("obs_rate"))
        .orderBy(col("bin"))
    }),

    // P10: seeded sampling (rows-only: RNG streams differ per engine)
    "p10_sample" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .sample(withReplacement = false, 0.1, seed = 42)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // P11/M10: group-wise split membership (rows-only; ratio + overlap
    // asserts live in ScalaTest)
    "p11_group_split" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
      val (train, test) = graft.ml.ModelSelection.trainTestSplit(
        o, randomSeed = 42, trainSize = Some(0.8),
        groupCol = Some("o_custkey"))
      train.select(lit("train").as("part"), col("o_orderkey"))
        .union(test.select(lit("test").as("part"), col("o_orderkey")))
        .groupBy(col("part")).agg(count(lit(1)).as("n"))
        .orderBy(col("part"))
    }),

    // P13: deterministic engine-portable Bernoulli sample via
    // md5-derived uniform hash — the reproducible-split idiom, and the
    // one sampler with an exact cross-engine oracle
    "p13_hash_sample" -> ((s, dir) => {
      graft.operators.Sketches.hashSample(
          Tables(s, dir, "documents"), col("doc_id"), fraction = 0.2)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    // P14: deterministic bottom-k-per-stratum sample — p12's
    // engine-portable twin: exactly k docs per language, chosen by
    // md5-hash order via ONE bounded-state aggregate (no per-row
    // shuffle/sort), replayable as a plain SQL predicate
    "p14_bottomk_sample" -> ((s, dir) => {
      graft.operators.Sketches.bottomKSample(
          Tables(s, dir, "documents"), "lang", col("doc_id"), k = 20)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

    // P15: deterministic WEIGHTED bottom-k sample — longer documents
    // (n_chars) more likely kept, 10 per source (sf0.01 strata hold
    // 25 docs — k must cut for the gate to be non-vacuous), a pure
    // function of (doc_id, n_chars): priority = hash div weight,
    // k-th-smallest-distinct threshold per stratum from ONE bounded
    // aggregate (engine-portable twin of PPS-style weighted sampling)
    "p15_weighted_sample" -> ((s, dir) => {
      graft.operators.Sketches.weightedBottomKSample(
          Tables(s, dir, "documents"), "source", col("doc_id"),
          col("n_chars"), k = 10)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),

    // P12: stratified per-language sampling in one scan (rows-only:
    // RNG streams differ per engine; per-stratum ratio asserts live in
    // ScalaTest)
    "p12_stratified_sample" -> ((s, dir) => {
      graft.operators.Sketches.stratifiedSample(
          Tables(s, dir, "documents"), "lang",
          Map("en" -> 0.5, "fr" -> 0.25, "de" -> 0.25, "es" -> 0.1),
          seed = 42)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang"))
    })
  )

  val oracles: Map[String, String] = Map(
    "p13_hash_sample" ->
      """SELECT doc_id, source FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 < 2000
        |ORDER BY doc_id""".stripMargin,

    // Replays the bottom-k threshold semantic: k-th smallest DISTINCT
    // hash per language is the selection threshold, kept rows are
    // hash ≤ threshold (for unique doc_ids: exactly k per language)
    "p14_bottomk_sample" ->
      """WITH h AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
        |  FROM documents WHERE lang IS NOT NULL),
        |thr AS (
        |  SELECT lang, max(hv) AS t FROM (
        |    SELECT lang, hv,
        |      row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn
        |    FROM (SELECT DISTINCT lang, hv FROM h))
        |  WHERE rn <= 20 GROUP BY lang)
        |SELECT h.doc_id, h.lang FROM h JOIN thr USING (lang)
        |WHERE h.hv <= thr.t
        |ORDER BY h.doc_id""".stripMargin,

    // Weighted twin of p14: priority = hash // weight (BIGINT // BIGINT
    // stays BIGINT — no HUGEINT risk), threshold = 10th smallest
    // DISTINCT priority per source, keep priority <= threshold
    "p15_weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id, source, n_chars,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      // greatest(n_chars, 1) AS prio
        |  FROM documents WHERE source IS NOT NULL),
        |thr AS (
        |  SELECT source, max(prio) AS t FROM (
        |    SELECT source, prio,
        |      row_number() OVER (PARTITION BY source ORDER BY prio) AS rn
        |    FROM (SELECT DISTINCT source, prio FROM h))
        |  WHERE rn <= 10 GROUP BY source)
        |SELECT h.doc_id, h.source, h.n_chars FROM h JOIN thr USING (source)
        |WHERE h.prio <= thr.t
        |ORDER BY h.doc_id""".stripMargin,

    "m11_target" ->
      """WITH panel AS (
        |  SELECT o_custkey AS custkey,
        |    CAST(date_trunc('month', o_orderdate) AS DATE) AS mois,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1, 2),
        |ev AS (SELECT o_custkey AS custkey,
        |    CAST(min(o_orderdate) AS DATE) AS event_date
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1)
        |SELECT p.custkey, p.mois, p.n_orders,
        |  CASE WHEN ev.event_date IS NOT NULL
        |    AND CAST(p.mois + INTERVAL 3 MONTH AS DATE) >= ev.event_date
        |    THEN 1 ELSE 0 END AS target
        |FROM panel p LEFT JOIN ev USING (custkey)
        |ORDER BY p.custkey, p.mois""".stripMargin,

    "m14_threshold_metrics" ->
      """WITH scored AS (
        |  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label,
        |    o_totalprice / 500000.0 AS score
        |  FROM orders),
        |t AS (SELECT CAST(unnest([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS DOUBLE) AS threshold)
        |SELECT threshold,
        |  count(CASE WHEN score >= threshold AND label = 1 THEN 1 END) AS tp,
        |  count(CASE WHEN score >= threshold AND label = 0 THEN 1 END) AS fp,
        |  count(CASE WHEN score < threshold AND label = 1 THEN 1 END) AS fn,
        |  count(CASE WHEN score < threshold AND label = 0 THEN 1 END) AS tn
        |FROM scored CROSS JOIN t
        |GROUP BY threshold ORDER BY threshold""".stripMargin,

    "m16_calibration" ->
      """WITH b AS (
        |  SELECT least(CAST(floor(o_totalprice / 50000.0) AS BIGINT), 9) AS bin,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label,
        |    o_totalprice
        |  FROM orders),
        |g AS (SELECT bin, count(*) AS n,
        |    CAST(sum(label) AS BIGINT) AS pos,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS psum
        |  FROM b GROUP BY 1)
        |SELECT bin, n, pos,
        |  psum / 500000.0 / n AS mean_score,
        |  CAST(pos AS DOUBLE) / n AS obs_rate
        |FROM g ORDER BY bin""".stripMargin
  )
}
