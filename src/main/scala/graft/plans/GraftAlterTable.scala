package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.analysis.{FieldName, UnresolvedTable}
import org.apache.spark.sql.catalyst.plans.logical.{AddColumns, AlterColumns, AlterColumnSpec, DropColumns, LogicalPlan, QualifiedColType, RenameColumn}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{StructField, StructType}

import graft.sources.SnapshotTable

/** SQL schema evolution for `USING graft` catalog tables:
  *
  * {{{
  * ALTER TABLE t ADD COLUMNS (c1 INT, c2 STRING COMMENT '...')
  * ALTER TABLE t RENAME COLUMN a TO b
  * ALTER TABLE t DROP COLUMN  a      -- and DROP COLUMNS (a, b)
  * ALTER TABLE t ALTER COLUMN a TYPE BIGINT
  * }}}
  *
  * mapped onto the engine's METADATA-ONLY evolution verbs
  * ([[SnapshotTable.addColumns]] / `renameColumn` (column mapping) /
  * `dropColumn` (retired-physical discipline) / `widenColumn`) — one
  * commit per statement, zero files rewritten.
  *
  * Injection point: the hint-resolution batch, same reason as
  * [[ResolveGraftTimeTravel]] — Spark's own handling of the v2 ALTER
  * plans for session-catalog v1 tables either throws
  * (RENAME/DROP/ALTER COLUMN are "v2 only") or refuses the provider
  * (ADD COLUMNS requires a FileFormat-backed source) inside the
  * Resolution batch, before any post-hoc rule runs. The rule claims
  * only UNRESOLVED alter plans whose target is a graft-provider
  * catalog table; everything else keeps Spark's own behavior.
  *
  * Grammar the engine cannot honor refuses LOUDLY at analysis with
  * the reason named: nested fields (the reference surface has no
  * struct evolution), FIRST/AFTER positions (graft's schema order is
  * append-only — physical names make order cosmetic anyway), and
  * DEFAULT values (a metadata-only add reads null for old rows; a
  * default would silently lie about what is stored). After each
  * commit the catalog's pinned data schema re-records, so the very
  * next SELECT resolves against the evolved reality. */
case class ResolveGraftAlterTable(spark: SparkSession)
  extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case a @ AddColumns(u: UnresolvedTable, cols) =>
        graftTarget(u).fold[LogicalPlan](a) { case (path, ident) =>
          GraftAddColumnsCommand(path, ident, cols.map(toField))
        }
      case r @ RenameColumn(u: UnresolvedTable, column, newName) =>
        graftTarget(u).fold[LogicalPlan](r) { case (path, ident) =>
          GraftRenameColumnCommand(path, ident, single(column), newName)
        }
      case d @ DropColumns(u: UnresolvedTable, cols, ifExists) =>
        graftTarget(u).fold[LogicalPlan](d) { case (path, ident) =>
          GraftDropColumnsCommand(path, ident, cols.map(single), ifExists)
        }
      case ac @ AlterColumns(u: UnresolvedTable, specs) =>
        graftTarget(u).fold[LogicalPlan](ac) { case (path, ident) =>
          GraftWidenColumnsCommand(path, ident, specs.map(toWiden))
        }
    }

  private def toField(c: QualifiedColType): StructField = {
    require(c.path.isEmpty,
      s"ALTER TABLE ADD COLUMNS on a graft table supports top-level " +
        s"columns only (got nested ${c.name.mkString(".")})")
    require(c.position.isEmpty,
      "ALTER TABLE ADD COLUMNS on a graft table does not support " +
        "FIRST/AFTER — columns append (physical-name mapping makes " +
        "order cosmetic)")
    require(c.default.isEmpty,
      "ALTER TABLE ADD COLUMNS on a graft table does not support " +
        "DEFAULT — a metadata-only add reads null for existing rows; " +
        "a default would misreport what is stored")
    val f = StructField(c.colName, c.dataType, nullable = true)
    c.comment.fold(f)(cm => f.withComment(cm))
  }

  private def single(f: FieldName): String = {
    require(f.name.length == 1,
      s"graft schema evolution supports top-level columns only " +
        s"(got nested ${f.name.mkString(".")})")
    f.name.head
  }

  private def toWiden(s: AlterColumnSpec): (String, org.apache.spark
      .sql.types.DataType) = {
    require(s.newDataType.isDefined && s.newNullability.isEmpty &&
        s.newComment.isEmpty && s.newPosition.isEmpty &&
        s.newDefaultExpression.isEmpty && !s.dropDefault,
      "ALTER COLUMN on a graft table supports TYPE widening only " +
        "(nullability/comment/position/default changes are not part " +
        "of the manifest schema contract)")
    (single(s.column), s.newDataType.get)
  }

  /** (storage path, identifier) when the 1- or 2-part session-catalog
    * name resolves to a graft-provider table; None otherwise. */
  private def graftTarget(u: UnresolvedTable)
      : Option[(String, TableIdentifier)] = {
    val cat = spark.sessionState.catalog
    val ident = u.multipartIdentifier match {
      case Seq(t) => Some(TableIdentifier(t))
      case Seq(db, t) => Some(TableIdentifier(t, Some(db)))
      case _ => None
    }
    ident.filter(i => !cat.isTempView(u.multipartIdentifier) &&
        cat.tableExists(i)).flatMap { id =>
      val meta = cat.getTableMetadata(id)
      if (meta.provider.exists(_.equalsIgnoreCase("graft")))
        meta.storage.properties.get("path")
          .orElse(meta.storage.locationUri.map(_.toString
            .stripPrefix("file:")))
          .map(p => (p, id))
      else None
    }
  }
}

private[plans] object GraftAlterSync {
  /** Post-evolution catalog upkeep: re-record the pinned data schema
    * from the table's new head and refresh the cached relation — the
    * next SELECT resolves against the evolved reality. */
  def apply(spark: SparkSession, path: String,
      table: TableIdentifier): Unit = {
    val cat = spark.sessionState.catalog
    val now = SnapshotTable.read(spark, path).schema
    val meta = cat.getTableMetadata(table)
    // the low-level alterTable, not alterTableDataSchema: the guarded
    // path refuses renames/drops ("we don't support dropping columns
    // yet") — but the manifest commit has ALREADY made them real;
    // the catalog record must follow. Graft catalog tables carry no
    // catalog-level partition columns (layout lives in the manifest),
    // so schema == dataSchema.
    if (meta.dataSchema != now) {
      require(meta.partitionColumnNames.isEmpty,
        "graft catalog tables must not carry catalog partition columns")
      cat.alterTable(meta.copy(schema = now))
    }
    cat.refreshTable(table)
    spark.catalog.refreshByPath(path)
  }
}

/** `ALTER TABLE t ADD COLUMNS (...)` → one metadata-only commit. */
case class GraftAddColumnsCommand(path: String, table: TableIdentifier,
    cols: Seq[StructField]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotTable.addColumns(spark, path, cols)
    GraftAlterSync(spark, path, table)
    Seq.empty
  }
}

/** `ALTER TABLE t RENAME COLUMN a TO b` → the column-mapping rename
  * (logical name changes, physical name — and every file — stays). */
case class GraftRenameColumnCommand(path: String, table: TableIdentifier,
    from: String, to: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotTable.renameColumn(spark, path, from, to)
    GraftAlterSync(spark, path, table)
    Seq.empty
  }
}

/** `ALTER TABLE t DROP COLUMN(S) ...` → one metadata-only commit per
  * column (the engine verb retires one physical name at a time);
  * IF EXISTS skips absentees. */
case class GraftDropColumnsCommand(path: String, table: TableIdentifier,
    cols: Seq[String], ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val present = SnapshotTable.read(spark, path).schema.fieldNames.toSet
    cols.foreach { c =>
      if (present.contains(c)) SnapshotTable.dropColumn(spark, path, c)
      else if (!ifExists) sys.error(s"no column $c in $path " +
        "(ALTER TABLE ... DROP COLUMNS ... IF EXISTS skips absentees)")
    }
    GraftAlterSync(spark, path, table)
    Seq.empty
  }
}

/** `ALTER TABLE t ALTER COLUMN c TYPE <wider>` → the widen verb
  * (metadata-only; old files up-cast at read). */
case class GraftWidenColumnsCommand(path: String, table: TableIdentifier,
    widens: Seq[(String, org.apache.spark.sql.types.DataType)])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    widens.foreach { case (c, t) =>
      SnapshotTable.widenColumn(spark, path, c, t) }
    GraftAlterSync(spark, path, table)
    Seq.empty
  }
}
