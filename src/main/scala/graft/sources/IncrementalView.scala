package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over a snapshot table's
  * CDC feed: keep a (group → count, sum) aggregate table in sync with
  * its base table at a cost proportional to CHURN, never base size.
  *
  * The algebra is the classical delta-maintenance rule for
  * count/sum aggregates: the change feed's row images contribute
  * (+1, +value) per insert and (−1, −value) per delete; summing the
  * contributions per group yields the group's delta, and
  * new = old + delta. Groups whose count reaches zero are REMOVED
  * (matching a full recompute, where an empty group has no row).
  * min/max are deliberately out of scope — they are not
  * delta-maintainable under deletes without per-group history.
  *
  * Scale shape: one aggregate over the feed (churn-sized, map-side
  * combined), one group-keyed join against the view, then ONE
  * [[SnapshotTable.merge]] carrying both the upserts and the
  * emptied-group removals (`removeKeys`) — rewrite cost is the view
  * files the changed groups touch. Nothing rescans the base table,
  * nothing collects keys to the driver.
  */
object IncrementalView {

  /** Refresh the count/sum view at `aggPath` (schema: groupCol,
    * `n`, `total` — both long) from the base table's
    * [[SnapshotTable.changes]] feed between `fromVersion` and
    * `toVersion`. `valueCol` must be an integral column of the base
    * (sum semantics are exact; convert money to minor units
    * upstream). Returns the view's new version (its current one if
    * the feed is empty of effective changes). */
  def refreshCountSum(spark: SparkSession, basePath: String,
      aggPath: String, groupCol: String, valueCol: String,
      fromVersion: Int, toVersion: Option[Int] = None): Int = {
    val feed = SnapshotTable.changes(spark, basePath, fromVersion,
      toVersion)
    val sign = when(col("change_type") === "insert", lit(1L))
      .otherwise(lit(-1L))
    val delta = feed
      .groupBy(col(groupCol))
      .agg(sum(sign).as("dn"),
        sum(sign * col(valueCol).cast("long")).as("dv"))
      .filter(col("dn") =!= 0L || col("dv") =!= 0L)
    val old = SnapshotTable.read(spark, aggPath)
      .select(col(groupCol), col("n").as("old_n"),
        col("total").as("old_total"))
    val changed = delta.join(old, Seq(groupCol), "left")
      .select(col(groupCol),
        (coalesce(col("old_n"), lit(0L)) + col("dn")).as("n"),
        (coalesce(col("old_total"), lit(0L)) + col("dv")).as("total"))
      .localCheckpoint() // two consumers below; compute the join once
    // upserts and emptied-group removals ride ONE merge rewrite —
    // fully distributed, no driver-side key list, no second pass
    SnapshotTable.merge(
      changed.filter(col("n") =!= 0L)
        .select(col(groupCol), col("n"), col("total")),
      aggPath, Seq(groupCol),
      removeKeys = Some(changed.filter(col("n") === 0L)
        .select(col(groupCol))))
  }
}
