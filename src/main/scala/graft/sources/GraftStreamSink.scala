package graft.sources

import org.apache.spark.sql.{DataFrame, GraftSqlAccess, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink

/** `df.writeStream.format("graft").start(path)` — the snapshot table
  * as a registered Structured Streaming SINK, closing the read/write
  * asymmetry (`readStream.format("graft")` has existed since r13;
  * until now the write side forced every pipeline to hand-roll
  * `foreachBatch { (b, id) => appendStreamBatch(b, path, id) }`).
  *
  * Exactly-once comes from [[SnapshotTable.appendStreamBatch]]: the
  * micro-batch id rides INSIDE the atomic manifest commit, so a
  * replayed batch after a crash/restart is recognized from the log
  * head and skipped — no separate delivery ledger whose update could
  * tear away from the data commit. Bloom maintenance, stats harvest,
  * and schema/partition-layout recording all flow through the same
  * batch-append path every other writer uses.
  *
  * Append output mode only, refused loudly otherwise: Complete and
  * Update would require the sink to rewrite or upsert state per
  * trigger — semantics [[SnapshotTable.merge]] provides explicitly
  * under user control, not silently per micro-batch.
  *
  * The first batch CREATES the table; `partitionBy` (from the stream
  * writer or a `partitionBy` option, comma-separated) applies then
  * and must match the stored layout ever after. `mergeSchema=true`
  * admits a restarted stream whose schema gained columns — the
  * additive evolution commits with the batch, metadata-only, exactly
  * [[SnapshotTable.append]]'s evolveSchema contract (the
  * drifting-CDC-ingestion shape); schema drift is refused loudly
  * otherwise.
  *
  * Reference behavior source: sf_datalake writes all outputs as plain
  * parquet snapshots (`io.py:89-99`); this is the beyond-reference
  * streaming-lakehouse surface.
  */
private[graft] class GraftStreamSink(
    sqlContext: SQLContext,
    path: String,
    partitionBy: Seq[String],
    mergeSchema: Boolean) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame is the micro-batch engine's incremental
    // execution — pin its rows to an RDD and re-wrap as a plain batch
    // frame before handing it to the batch-append path (which plans a
    // fresh write job over it)
    val batch = GraftSqlAccess.batchDf(sqlContext.sparkSession, data)
    SnapshotTable.appendStreamBatch(batch, path, batchId, partitionBy,
      evolveSchema = mergeSchema)
  }

  override def toString: String = s"GraftStreamSink[$path]"
}
