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
  def hashSample(df: DataFrame, keyCol: Column, fraction: Double,
      salt: String = ""): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    val bps = math.round(fraction * 10000).toInt
    val h = conv(substring(md5(concat(keyCol.cast("string"), lit(salt))),
      1, 15), 16, 10).cast("long")
    df.filter(h % 10000 < bps)
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
