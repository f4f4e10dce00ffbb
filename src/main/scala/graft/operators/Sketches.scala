package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the 100 TB path for the
  * stats the exact operators (A8 quantiles, A9 distribution counts)
  * compute exactly at survey scale.
  *
  * Scale design: every sketch here is a bounded-size, mergeable
  * aggregation buffer (HyperLogLog++ registers, Greenwald-Khanna /
  * KLL-style quantile summaries), so the plan is ONE map-side-combined
  * hash aggregate — no sort, no full shuffle of values, memory
  * independent of row count. Exact distinct/percentile on 100 TB means
  * shuffling every distinct value; these shuffle kilobytes per group.
  *
  * The outputs are approximate and engine-specific (no cross-engine
  * oracle can hash-match); each operator is gated by a ScalaTest
  * accuracy spec against the exact answer instead.
  */
object Sketches {

  /** Approximate distinct `valueCol` count per group via HyperLogLog++
    * (`rsd` = target relative standard deviation). Deterministic for a
    * given dataset: register merges are commutative. */
  def approxDistinctByGroup(df: DataFrame, groupCols: Seq[String],
      valueCol: String, rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Approximate per-group quantiles (percentile_approx; `accuracy` is
    * the 1/ε summary size — error ≤ 1/accuracy of the rank). */
  def approxQuantilesByGroup(df: DataFrame, groupCol: String,
      valueCol: String, probs: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    val aggs = probs.zipWithIndex.map { case (p, i) =>
      percentile_approx(col(valueCol), lit(p), lit(accuracy))
        .as(s"q_$i") }
    df.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Stratified sample: per-stratum Bernoulli fractions in ONE scan
    * (`df.stat.sampleBy`) — no per-stratum jobs, no shuffle; rows
    * stream through the filter at full scan speed. */
  def stratifiedSample(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Deterministic, ENGINE-PORTABLE Bernoulli sample: keep a row iff a
    * uniform 60-bit integer derived from md5(key || salt) falls under
    * `fraction`. Unlike seeded `sample()` (whose hash is engine- and
    * partitioning-specific), this is a pure function of the row key —
    * the same rows are selected on any cluster size, any engine with
    * md5, and any re-run: the reproducible-split idiom for 100 TB
    * training-data pipelines (and the one sampler here with an exact
    * cross-engine oracle). One scan-stage filter, no shuffle, no state.
    *
    * `fraction` is quantized to basis points (1/10000). Vary `salt` to
    * draw independent samples from the same keys. */
  /** md5-derived uniform bucket in [0, 10000) — the shared predicate
    * behind [[hashSample]] and [[temperatureSample]]. */
  def hashBucket(keyCol: Column, salt: String = ""): Column =
    conv(substring(md5(concat(keyCol.cast("string"), lit(salt))),
      1, 15), 16, 10).cast("long") % 10000

  def hashSample(df: DataFrame, keyCol: Column, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    val bps = math.round(fraction * 10000).toInt
    df.filter(hashBucket(keyCol, salt) < bps)
  }

  /** Temperature-smoothed mixture sampling — the data-mixing baseline
    * (sample stratum s with weight ∝ n_s^alpha; alpha < 1 flattens the
    * natural distribution toward uniform, up-weighting rare
    * languages/domains): choose per-stratum Bernoulli fractions so the
    * expected total is `budgetRows` split ∝ n_s^alpha, then select
    * rows with the deterministic [[hashBucket]] predicate — the whole
    * draw is a pure function of the row keys, reproducible across
    * re-runs, partitionings, and engines.
    *
    * Determinism recipe (the oracle replays it bit-for-bit): per-
    * stratum sqrt at alpha = 0.5 (IEEE-correctly-rounded in every
    * engine, unlike pow) rounded to 9 decimals, summed exactly as
    * decimals, fractions floored to basis points. Stratum counts
    * collect to the driver — O(#strata) scalars, the classCounts
    * precedent. */
  def temperatureSample(df: DataFrame, stratumCol: String, keyCol: Column,
      budgetRows: Long, alpha: Double = 0.5,
      salt: String = ""): DataFrame = {
    val counts = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    def weight(n: Long): BigDecimal = BigDecimal(
        if (alpha == 0.5) math.sqrt(n.toDouble)
        else math.pow(n.toDouble, alpha))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val wSum = counts.values.map(weight).sum.toDouble
    val bps: Map[String, Int] = counts.map { case (s, n) =>
      s -> math.min(10000,
        math.floor(10000.0 * budgetRows * weight(n).toDouble / wSum / n)
          .toInt)
    }
    val bpsCol = bps.foldLeft(lit(0)) { case (acc, (s, b)) =>
      when(col(stratumCol) === s, b).otherwise(acc)
    }
    df.filter(hashBucket(keyCol, salt) < bpsCol)
  }

  /** Quota selection per stratum (the static data-MIXING primitive:
    * "N_s best documents from each source/language"): rank rows inside
    * each stratum by `orderCols` and keep the top `quotas(stratum)`.
    *
    * Scale note: the rank is a per-stratum sort — fine while each
    * stratum fits a task's spill budget (strata are sources/languages,
    * so usually yes). For pathologically hot strata, pre-filter with an
    * `approxQuantilesByGroup` score threshold at quota/|stratum| rank,
    * then exact-rank only the survivors. */
  def quotaSelect(df: DataFrame, stratumCol: String,
      orderCols: Seq[Column], quotas: Map[String, Int]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(orderCols: _*)
    val quotaCol = quotas.foldLeft(lit(0)) { case (acc, (s, q)) =>
      when(col(stratumCol) === s, q).otherwise(acc)
    }
    df.withColumn("stratum_rank", row_number().over(w))
      .filter(col("stratum_rank") <= quotaCol)
  }

  /** EXACT heavy hitters: tokens appearing more than `minFrac` of all
    * token occurrences. One explode + one map-side-combined count
    * aggregate + a scalar total broadcast back — exact, and still
    * scale-safe because the post-combine key space is the vocabulary,
    * not the corpus. (A count-min sketch saves the vocabulary-sized
    * shuffle only when the vocabulary itself is huge; for word-like
    * tokens exact wins.) */
  def heavyHitters(df: DataFrame, textCol: String,
      minFrac: Double): DataFrame = {
    val counts = df
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
    // global total via an unpartitioned window over the POST-AGGREGATE
    // frame: only vocabulary-sized rows funnel through the single
    // partition, and the corpus is scanned once (re-aggregating counts
    // for the total would rebuild the whole explode+count lineage)
    counts
      .withColumn("total", sum(col("n"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .filter(col("n") > col("total") * minFrac)
      .select(col("token"), col("n"))
  }
}
