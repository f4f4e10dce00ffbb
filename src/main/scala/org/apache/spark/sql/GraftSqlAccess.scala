package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Public forwarding for sql-private Column <-> Expression conversion
  * (extension-shim technique; no Spark code, only forwarding). */
object GraftSqlAccess {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame — the standard way
    * to hand a custom LogicalPlan node to the session's planner. */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** Wrap a BaseRelation (e.g. a HadoopFsRelation over a custom
    * FileIndex) as a DataFrame via the session's standard path. */
  def ofRelation(spark: SparkSession,
      rel: org.apache.spark.sql.sources.BaseRelation): DataFrame =
    spark.asInstanceOf[classic.SparkSession].baseRelationToDataFrame(rel)

  /** Re-wrap a batch DataFrame as a STREAMING one — what a V1
    * streaming `Source.getBatch` must return (the micro-batch
    * executor asserts `isStreaming`; file sources use the same
    * internalCreateDataFrame shape). The batch plan is pinned to an
    * RDD first, so the streaming wrapper replays exactly the rows the
    * source computed for the offset range. */
  def streamingDf(spark: SparkSession, df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(
      ds.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** A STREAMING DataFrame over pre-built InternalRows — the shape a
    * V1 source needs for batches it must construct WITHOUT touching
    * storage (e.g. a deferred-failure batch for a vacuumed replay
    * range: recovery discards it unexecuted, a real execution fails
    * loudly). */
  def streamingDfFromInternal(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[
        org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(
      rdd, schema, isStreaming = true)

  /** The inverse re-wrap for a V1 streaming SINK: the micro-batch
    * DataFrame handed to `Sink.addBatch` still carries streaming
    * leaves in its logical plan, so re-planning it through the
    * DataFrame writer path (as a batch write must) would trip the
    * unsupported-operation checker. Pin the batch's rows to the
    * incremental execution's RDD and wrap them as a plain BATCH frame
    * — no row re-encoding, same rows, batch semantics. */
  def batchDf(spark: SparkSession, df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(
      ds.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
