package graft.plans

import org.apache.spark.sql.{GraftSqlAccess, Row, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand

import graft.sources.SnapshotTable

/** SQL `INSERT INTO` / `INSERT OVERWRITE TABLE` for `USING graft`
  * catalog tables, routed through the MANIFEST COMMITTER.
  *
  * Spark's analyzer turns an insert over any HadoopFsRelation into
  * [[InsertIntoHadoopFsRelationCommand]] — a raw file-source write
  * into the table directory, which for a graft table means parquet
  * files no manifest references (readers silently never see the rows;
  * vacuum reaps them as orphans). The formats refuse `prepareWrite`
  * loudly, so without this rule SQL inserts FAIL SAFELY. With
  * [[graft.GraftExtensions]] installed, this post-hoc rule — running
  * after Spark's own `PreprocessTableInsertion` has already aligned
  * the query to the table schema (names, types, by-position casts) —
  * rewrites the command into [[GraftInsertCommand]], one ordinary
  * append/overwrite commit. Rewrites fire ONLY when the relation's
  * file format carries an `insertablePath` (stamped by the data
  * source exclusively on UNPINNED head-version relations): an insert
  * through a `versionAsOf`/`timestampAsOf` catalog table keeps the
  * loud refusal — writing into the past is RESTORE's explicit job.
  * Static partition specs (`PARTITION (p=1)`) are not supported and
  * keep the refusal too (graft layouts take partition values from the
  * data, Hive-style static pinning has no manifest meaning). */
object RewriteGraftInserts extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan match {
      case cmd: InsertIntoHadoopFsRelationCommand
          if cmd.staticPartitions.isEmpty =>
        graft.sources.GraftInsertTarget.of(cmd.fileFormat) match {
          case Some(path) =>
            GraftInsertCommand(path, cmd.query,
              overwrite = cmd.mode == SaveMode.Overwrite,
              columnNames = cmd.outputColumnNames,
              table = cmd.catalogTable.map(_.identifier))
          case None => cmd
        }
      case other => other
    }
}

/** One manifest commit for a SQL insert: Append → table append
  * (schema checked against the stored schema, bloom policy
  * maintained, layout inherited), Overwrite → full-replacement
  * commit (prior versions stay time-travelable). The child query
  * arrives already aligned to the table schema by
  * `PreprocessTableInsertion`; `columnNames` re-labels the aligned
  * output with the table's column names (the alignment casts keep
  * positional exprs whose names can drift). */
case class GraftInsertCommand(path: String, query: LogicalPlan,
    overwrite: Boolean, columnNames: Seq[String],
    table: Option[org.apache.spark.sql.catalyst.TableIdentifier])
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val df0 = GraftSqlAccess.ofRows(spark, query)
    val df = if (columnNames.nonEmpty &&
        columnNames.length == df0.columns.length)
      df0.toDF(columnNames: _*) else df0
    if (overwrite) SnapshotTable.overwrite(df, path)
    else SnapshotTable.append(df, path)
    // the catalog caches the resolved relation per table (with its
    // version-pinned file index) — drop it so the next read
    // re-resolves at the new head version, as Spark's own insert
    // command refreshes after a write
    table.foreach(t => spark.sessionState.catalog.refreshTable(t))
    spark.catalog.refreshByPath(path)
    Seq.empty
  }
}
