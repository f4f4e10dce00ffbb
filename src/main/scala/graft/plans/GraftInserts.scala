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
  import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression}
  import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, InsertStarAction, MergeIntoTable, UpdateAction, UpdateStarAction, UpdateTable}
  import org.apache.spark.sql.execution.datasources.LogicalRelation
  import org.apache.spark.sql.execution.datasources.HadoopFsRelation

  /** The graft table path behind a DML target plan, when it is an
    * UNPINNED head-version graft relation (the data source stamps the
    * mark; a time-travel pin carries none — writing into the past
    * stays refused). The target may sit under a SubqueryAlias. */
  private def targetPath(plan: LogicalPlan): Option[String] =
    plan.collectFirst {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) => fs
    }.flatMap(fs => graft.sources.GraftInsertTarget.of(fs.fileFormat))

  private def tableOf(plan: LogicalPlan)
      : Option[org.apache.spark.sql.catalyst.TableIdentifier] =
    plan.collectFirst {
      case LogicalRelation(_, _, Some(t), _, _) => t.identifier
    }

  /** A RESOLVED condition re-expressed by column NAME, so it can
    * apply to the fresh snapshot read the engine verb performs (the
    * original AttributeReferences carry exprIds of the statement's
    * relation instance, which that read does not share). */
  private def byName(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }

  /** A MERGE condition decomposed into (targetCol, sourceCol) key
    * pairs — the keyed-merge identity the engine verb joins on. Only
    * a conjunction of cross-side attribute equalities qualifies
    * (Delta's merge performs best under exactly this shape too);
    * anything else returns None and the statement is refused with the
    * supported grammar named. */
  private def mergeKeyPairs(cond: Expression, target: LogicalPlan,
      source: LogicalPlan): Option[Seq[(String, String)]] = {
    val tset = target.outputSet
    val sset = source.outputSet
    def pair(e: Expression): Option[(String, String)] = e match {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        if (tset.contains(a) && sset.contains(b)) Some((a.name, b.name))
        else if (tset.contains(b) && sset.contains(a))
          Some((b.name, a.name))
        else None
      case _ => None
    }
    def split(e: Expression): Option[Seq[(String, String)]] = e match {
      case And(l, r) => for { a <- split(l); b <- split(r) } yield a ++ b
      case other => pair(other).map(Seq(_))
    }
    split(cond)
  }

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
      // SQL DELETE FROM a graft catalog table → the engine's
      // copy-on-write delete verb (file-pruned, only touched files
      // rewritten), one manifest commit. Conditions are carried as
      // COLUMNS (opaque to CheckAnalysis — the by-name re-expression
      // is deliberately unresolved until the verb's own fresh read)
      case DeleteFromTable(target, condition)
          if targetPath(target).isDefined && condition.resolved =>
        GraftDeleteCommand(targetPath(target).get,
          GraftSqlAccess.column(byName(condition)), tableOf(target))
      // SQL UPDATE ... SET ... WHERE → the engine's merge-on-read
      // update verb (old images masked via deletion vectors, updated
      // images appended; zero data files rewritten)
      case UpdateTable(target, assignments, condition)
          if targetPath(target).isDefined &&
            assignments.forall(_.resolved) &&
            condition.forall(_.resolved) =>
        val sets = assignments.map {
          case Assignment(key: AttributeReference, value) =>
            key.name -> GraftSqlAccess.column(byName(value))
          case Assignment(key, _) =>
            throw new UnsupportedOperationException(
              "graft UPDATE: only top-level column assignments are " +
                s"supported, got $key (nested-field updates need a " +
                "read-modify-write through the DataFrame API)")
        }
        GraftUpdateCommand(targetPath(target).get, sets,
          condition.map(c => GraftSqlAccess.column(byName(c))),
          tableOf(target))
      // SQL MERGE INTO ... USING ... ON <key equalities> — the four
      // canonical clause shapes map onto the engine's keyed merge
      // verb (one commit, file-pruned, removeKeys for deletes);
      // richer shapes (clause conditions, explicit SET lists,
      // NOT MATCHED BY SOURCE, schema evolution) are refused loudly
      // with the supported grammar named — SnapshotTable.merge under
      // the DataFrame API covers them compositionally.
      case m @ MergeIntoTable(target, source, cond, matched,
          notMatched, notMatchedBySource, _)
          if targetPath(target).isDefined && m.childrenResolved &&
            cond.resolved =>
        val path = targetPath(target).get
        def refuse(what: String): Nothing =
          throw new UnsupportedOperationException(
            s"graft MERGE INTO: $what — supported shapes: ON " +
              "<conjunction of target.col = source.col> with clauses " +
              "[WHEN MATCHED THEN UPDATE SET *] [WHEN NOT MATCHED " +
              "THEN INSERT *] or [WHEN MATCHED THEN DELETE] (no " +
              "clause conditions, no NOT MATCHED BY SOURCE, no " +
              "schema evolution); use SnapshotTable.merge / updateMoR " +
              "for richer shapes")
        if (m.withSchemaEvolution) refuse("WITH SCHEMA EVOLUTION")
        if (notMatchedBySource.nonEmpty)
          refuse("WHEN NOT MATCHED BY SOURCE")
        val keys = mergeKeyPairs(cond, target, source)
          .getOrElse(refuse(s"merge condition `${cond.sql}` is not a " +
            "conjunction of cross-side column equalities"))
        // `SET *` / `INSERT *` arrive either verbatim (star actions)
        // or pre-expanded by the analyzer into per-column assignments
        // — star-equivalent when every target column is assigned its
        // same-named source attribute
        def starLike(assigns: Seq[Assignment]): Boolean = {
          // the analyzer may wrap a star assignment's source attribute
          // in its own store-assignment CAST (type alignment) — still
          // the star shape (GraftMergeCommand re-applies the table's
          // exact types before the keyed merge)
          def attrOf(e: Expression): Option[AttributeReference] =
            e match {
              case a: AttributeReference => Some(a)
              case c: org.apache.spark.sql.catalyst.expressions.Cast =>
                c.child match {
                  case a: AttributeReference => Some(a)
                  case _ => None
                }
              case _ => None
            }
          val pairs = assigns.flatMap {
            case Assignment(t: AttributeReference, v)
                if target.outputSet.contains(t) =>
              attrOf(v).filter(a => source.outputSet.contains(a) &&
                a.name == t.name).map(_ => t.name)
            case _ => None
          }
          pairs.length == assigns.length &&
            target.output.map(_.name).toSet == pairs.toSet
        }
        val up = matched.collect {
          case UpdateStarAction(None) => true
          case UpdateAction(None, assigns, _) if starLike(assigns) =>
            true
        }
        val del = matched.collect { case DeleteAction(None) => true }
        val ins = notMatched.collect {
          case InsertStarAction(None) => true
          case InsertAction(None, assigns) if starLike(assigns) => true
        }
        val shape =
          if (matched.length + notMatched.length !=
              up.length + del.length + ins.length)
            refuse(s"unsupported clause combination " +
              s"(matched=$matched, notMatched=$notMatched)")
          else (up.length, del.length, ins.length) match {
            case (1, 0, 1) => "upsert"
            case (1, 0, 0) => "update_only"
            case (0, 0, 1) => "insert_only"
            case (0, 1, 0) => "delete_matched"
            case other => refuse(s"unsupported clause combination " +
              s"(matched=$matched, notMatched=$notMatched)")
          }
        GraftMergeCommand(path, source, keys, shape, tableOf(target))
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
/** `DELETE FROM <graft table> WHERE <cond>` as one copy-on-write
  * manifest commit ([[SnapshotTable.delete]]: two-level file pruning,
  * only files holding matches rewritten; a no-match delete commits
  * nothing). */
case class GraftDeleteCommand(path: String,
    condition: org.apache.spark.sql.Column,
    table: Option[org.apache.spark.sql.catalyst.TableIdentifier])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotTable.delete(spark, path, condition)
    table.foreach(t => spark.sessionState.catalog.refreshTable(t))
    spark.catalog.refreshByPath(path)
    Seq.empty
  }
}

/** `UPDATE <graft table> SET c = e, ... [WHERE <cond>]` as one
  * merge-on-read commit ([[SnapshotTable.updateMoR]]: matched rows'
  * old images masked by deletion vectors, updated images appended —
  * zero data files rewritten). No WHERE = every row. */
case class GraftUpdateCommand(path: String,
    sets: Seq[(String, org.apache.spark.sql.Column)],
    condition: Option[org.apache.spark.sql.Column],
    table: Option[org.apache.spark.sql.catalyst.TableIdentifier])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.lit
    SnapshotTable.updateMoR(spark, path,
      condition.getOrElse(lit(true)), sets.toMap)
    table.foreach(t => spark.sessionState.catalog.refreshTable(t))
    spark.catalog.refreshByPath(path)
    Seq.empty
  }
}

/** The four canonical `MERGE INTO` shapes as ONE keyed merge commit.
  * The source plan re-labels its key columns to the target's names,
  * projects down to the target's columns (UPDATE/INSERT `*`
  * semantics — the source must cover them; the verb refuses drift
  * loudly otherwise), and:
  *  - `upsert` (UPDATE * + INSERT *): the verb's native contract;
  *  - `update_only`: source restricted to keys that EXIST in the
  *    target (left-semi on the key columns) so unmatched source rows
  *    do NOT insert;
  *  - `insert_only`: source restricted to keys ABSENT from the target
  *    (left-anti) so matched rows are untouched;
  *  - `delete_matched`: empty update frame + the source's keys as
  *    removeKeys (absent keys are no-ops, matching SQL semantics). */
case class GraftMergeCommand(path: String, source: LogicalPlan,
    keys: Seq[(String, String)], shape: String,
    table: Option[org.apache.spark.sql.catalyst.TableIdentifier])
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{col, lit}
    val keyCols = keys.map(_._1)
    val renamed = keys.foldLeft(GraftSqlAccess.ofRows(spark, source)) {
      case (d, (t, s)) => if (t == s) d else d.withColumnRenamed(s, t)
    }
    val table0 = SnapshotTable.read(spark, path)
    // project to the table's columns AND types: star semantics let
    // the source carry promotable types (the analyzer validated the
    // store-assignment casts; this re-applies them), and the keyed
    // merge verb refuses any remaining drift loudly
    val src =
      if (shape == "delete_matched")
        renamed.select(keyCols.map(k =>
          col(k).cast(table0.schema(k).dataType).as(k)): _*)
      else renamed.select(table0.schema.fields.toSeq.map(f =>
        col(f.name).cast(f.dataType).as(f.name)): _*)
    shape match {
      case "upsert" =>
        SnapshotTable.merge(src, path, keyCols)
      case "update_only" =>
        SnapshotTable.merge(
          src.join(table0.select(keyCols.map(col): _*),
            keyCols, "left_semi"),
          path, keyCols)
      case "insert_only" =>
        SnapshotTable.merge(
          src.join(table0.select(keyCols.map(col): _*),
            keyCols, "left_anti"),
          path, keyCols)
      case "delete_matched" =>
        SnapshotTable.merge(table0.filter(lit(false)), path, keyCols,
          removeKeys = Some(src))
    }
    table.foreach(t => spark.sessionState.catalog.refreshTable(t))
    spark.catalog.refreshByPath(path)
    Seq.empty
  }
}

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
    // dynamic partition overwrite means "replace only the partitions
    // this data touches" — a different verb than the full-table
    // overwrite below. Refuse rather than silently over-delete; the
    // keyed/partition-scoped paths (merge, delete+append) express it
    // under user control. Spark's default (STATIC, no partition spec)
    // IS whole-table replacement, which matches.
    if (overwrite &&
        SnapshotTable.partitioning(spark, path).nonEmpty &&
        spark.conf.get("spark.sql.sources.partitionOverwriteMode",
          "static").equalsIgnoreCase("dynamic"))
      throw new UnsupportedOperationException(
        "graft INSERT OVERWRITE: partitionOverwriteMode=dynamic " +
          "(partition-scoped replacement) is not supported on a " +
          "partitioned graft table — this command replaces the WHOLE " +
          "table; use SnapshotTable.delete + append (or merge) for " +
          "partition-scoped rewrites")
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
