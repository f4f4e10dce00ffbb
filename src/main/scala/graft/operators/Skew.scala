package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins and aggregations.
  *
  * AQE's skew-join handling (spark.sql.adaptive.skewJoin) covers
  * sort-merge joins automatically; these helpers cover the cases AQE
  * does not: broadcast-ineligible hot-key equi-joins against small-ish
  * tables and two-phase aggregations over heavy-hitter keys.
  */
object Skew {

  /** Salted equi-join: the skewed (large) side gets a random salt in
    * [0, saltFactor); the small side is replicated saltFactor times so
    * every salted key finds its partner. Correct for inner and
    * left-outer joins on `keys`.
    *
    * Use when one join key dominates (a single reducer would receive a
    * partition-sized bucket) and the small side is too large to
    * broadcast outright.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left joins, got $joinType")
    val salted = large.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase aggregation for heavy-hitter group keys: partial
    * aggregate on (keys, salt), then final aggregate on keys. `aggs`
    * maps output column name → (partial aggregate of the input column,
    * final re-aggregate of the partial). Example:
    * {{{
    * twoPhaseAgg(df, Seq("k"), 16, Map(
    *   "total" -> ("v", sum _, sum _),
    *   "n"     -> ("v", c => count(c), c => sum(c))))
    * }}}
    */
  def twoPhaseAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
      aggs: Map[String, (String, Column => Column, Column => Column)])
      : DataFrame = {
    val salted = df.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val partialExprs = aggs.toSeq.map { case (out, (in, partial, _)) =>
      partial(col(in)).as(s"__p_$out")
    }
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialExprs.head, partialExprs.tail: _*)
    val finalExprs = aggs.toSeq.map { case (out, (_, _, fin)) =>
      fin(col(s"__p_$out")).as(out)
    }
    partial.groupBy(keys.map(col): _*)
      .agg(finalExprs.head, finalExprs.tail: _*)
  }
}
