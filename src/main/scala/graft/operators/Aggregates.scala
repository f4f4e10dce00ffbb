package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Group-by aggregation patterns from the reference (SURVEY.md §2.4). */
object Aggregates {

  /** Map-form aggregator with passthrough columns — the reference's
    * `SirenAggregator` contract (transform.py:471-539): aggregate
    * `aggMap` columns per `keyCols` with the named function, keep the
    * output column names identical to the inputs, and re-attach the
    * non-aggregated columns via distinct + left join.
    *
    * NOTE (reference quirk, preserved — SURVEY.md §7.4.4): if the
    * passthrough columns are not functionally dependent on the keys, the
    * re-join duplicates rows, exactly as the reference does.
    */
  def keyedAggregate(df: DataFrame, keyCols: Seq[String],
      aggMap: Map[String, String]): DataFrame = {
    val aggExprs = aggMap.toSeq.map { case (c, f) => expr(s"$f(`$c`)").as(c) }
    val aggregated = df.groupBy(keyCols.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
    val passthrough = df.columns.toSeq
      .filterNot(c => keyCols.contains(c) || aggMap.contains(c))
    if (passthrough.isEmpty) aggregated
    else {
      val other = df.select((keyCols ++ passthrough).map(col): _*).distinct()
      aggregated.join(other, keyCols, "left")
    }
  }

  /** Latest snapshot per group: the reference uses groupBy + last()
    * relying on upstream file order (altares_preprocessing.py:74-76 —
    * nondeterministic in general, SURVEY.md §7.4.5). We use
    * max_by(value, orderCol): deterministic, single hash aggregate,
    * no window shuffle. */
  def lastByGroup(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(col(valueCols.head), col(orderCol)).as(valueCols.head),
        valueCols.tail.map(c => max_by(col(c), col(orderCol)).as(c)): _*)

  /** Per-class row counts collected to the driver — drives resampling
    * ratios (reference transform.py:1129-1137). The collected map is
    * O(#classes), never O(rows). */
  def classCounts(df: DataFrame, classCol: String): Map[Any, Long] =
    df.groupBy(col(classCol)).count()
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap

  /** Per-column null counts as a single-row DataFrame
    * (reference utils.py:244-273 count_missing_values). */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c =>
      count(when(col(c).isNull, lit(1))).as(c)): _*)
}
