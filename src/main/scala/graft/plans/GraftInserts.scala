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

  /** The DML target plan stripped of alias layers ONLY. Anything else
    * wrapping the relation — a View (expanded SQL view = Project/
    * Filter over the base relation), or any other operator — returns
    * None so the statement FALLS THROUGH to Spark's own
    * unsupported-DML refusal. A collect-anywhere here would PIERCE
    * the view: `DELETE FROM v` where v = `SELECT .. WHERE region='EU'`
    * would rewrite into a whole-base-table delete that removes rows
    * the view never showed — a loud refusal turned into silent data
    * loss (ADVICE r16 #1). */
  @scala.annotation.tailrec
  private def unwrapAliases(plan: LogicalPlan): LogicalPlan = plan match {
    case org.apache.spark.sql.catalyst.plans.logical
        .SubqueryAlias(_, child) => unwrapAliases(child)
    case other => other
  }

  private def bareRelation(plan: LogicalPlan): Option[LogicalRelation] =
    unwrapAliases(plan) match {
      case r: LogicalRelation => Some(r)
      case _ => None
    }

  /** The graft table path behind a DML target plan, when the target
    * is the BARE table (aliases aside) and an UNPINNED head-version
    * graft relation (the data source stamps the mark; a time-travel
    * pin carries none — writing into the past stays refused). */
  private def targetPath(plan: LogicalPlan): Option[String] =
    bareRelation(plan)
      .collect { case LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
        => fs }
      .flatMap(fs => graft.sources.GraftInsertTarget.of(fs.fileFormat))

  private def tableOf(plan: LogicalPlan)
      : Option[org.apache.spark.sql.catalyst.TableIdentifier] =
    bareRelation(plan).flatMap(_.catalogTable).map(_.identifier)

  /** A RESOLVED condition re-expressed by column NAME, so it can
    * apply to the fresh snapshot read the engine verb performs (the
    * original AttributeReferences carry exprIds of the statement's
    * relation instance, which that read does not share). */
  private def byName(e: Expression): Expression = e.transform {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }

  /** [[byName]] for MERGE clause expressions, which may reference
    * BOTH sides (and the sides routinely share column names): target
    * attributes re-express as `__t_<name>`, source attributes as
    * `__s_<name>` — the prefixes [[GraftMergeRichCommand]]'s
    * side-tagged join frame carries, so `t.bal < s.bal` stays
    * unambiguous without the statement's exprIds. */
  private def byNameSided(e: Expression, target: LogicalPlan,
      source: LogicalPlan): Expression = e.transform {
    case a: AttributeReference if target.outputSet.contains(a) =>
      UnresolvedAttribute.quoted("__t_" + a.name)
    case a: AttributeReference if source.outputSet.contains(a) =>
      UnresolvedAttribute.quoted("__s_" + a.name)
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
        // an assignment key is either a top-level column or a
        // GetStructField chain (`SET s.a.b = x`) — nested assignments
        // lower to a read-modify-write of the BASE struct column via
        // Column.withField (r17; before, a loud refusal), so the MoR
        // verb still sees one top-level assignment per base column
        def keyPath(e: Expression): Option[(AttributeReference, Seq[String])] =
          e match {
            case a: AttributeReference => Some((a, Nil))
            case g: org.apache.spark.sql.catalyst.expressions
                .GetStructField =>
              keyPath(g.child).map { case (a, p) =>
                (a, p :+ g.extractFieldName) }
            case _ => None
          }
        val lowered = assignments.map {
          case Assignment(key, value) =>
            keyPath(key).getOrElse(
              throw new UnsupportedOperationException(
                "graft UPDATE: assignment target must be a column or " +
                  s"a struct field chain, got $key")) match {
              case (a, fields) =>
                (a.name, fields, GraftSqlAccess.column(byName(value)))
            }
        }
        val sets = lowered.groupBy(_._1).toSeq.map {
          case (base, as) =>
            val (whole, nested) = as.partition(_._2.isEmpty)
            if (whole.nonEmpty && nested.nonEmpty)
              throw new UnsupportedOperationException(
                s"graft UPDATE: column $base is assigned both whole " +
                  "and by nested field in one statement — ambiguous")
            if (nested.isEmpty) base -> whole.head._3
            else base -> nested.foldLeft(
              GraftSqlAccess.column(
                UnresolvedAttribute.quoted(base))) {
              case (acc, (_, fields, v)) =>
                acc.withField(fields.map(f =>
                  if (f.contains(".")) s"`$f`" else f).mkString("."), v)
            }
        }
        GraftUpdateCommand(targetPath(target).get, sets,
          condition.map(c => GraftSqlAccess.column(byName(c))),
          tableOf(target))
      // SQL MERGE INTO ... USING ... ON <key equalities> — mapped
      // onto the engine's keyed merge verb as ONE manifest commit.
      // The four unconditional star shapes keep the lean fast path
      // (key-restricted source, pruned reads, no target-image join);
      // everything richer — clause AND-conditions, explicit SET /
      // INSERT (cols) VALUES lists, WHEN NOT MATCHED BY SOURCE
      // (update/delete), merge-key reassignment — lowers to
      // [[GraftMergeRichCommand]]: clause expressions travel as
      // by-name Columns over a side-tagged join frame (__t_/__s_
      // prefixes keep shared column names unambiguous), re-resolved
      // against the command's own fresh reads. Only schema evolution
      // and non-equi ON conditions still refuse.
      case m @ MergeIntoTable(target, source, cond, matched,
          notMatched, notMatchedBySource, _)
          if targetPath(target).isDefined && m.childrenResolved &&
            cond.resolved &&
            (matched ++ notMatched ++ notMatchedBySource)
              .forall(_.resolved) =>
        val path = targetPath(target).get
        def refuse(what: String): Nothing =
          throw new UnsupportedOperationException(
            s"graft MERGE INTO: $what — supported grammar: ON " +
              "<conjunction of target.col = source.col> with clauses " +
              "[WHEN MATCHED [AND cond] THEN UPDATE SET */<assigns> " +
              "| DELETE] [WHEN NOT MATCHED [AND cond] THEN INSERT " +
              "*/<cols+values>] [WHEN NOT MATCHED BY SOURCE [AND " +
              "cond] THEN UPDATE <assigns> | DELETE], WITH SCHEMA " +
              "EVOLUTION adding source-only columns (no nested-field " +
              "assignments); use SnapshotTable.merge / updateMoR for " +
              "richer shapes")
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
        val fastShape =
          if (notMatchedBySource.nonEmpty ||
              matched.length + notMatched.length !=
                up.length + del.length + ins.length) None
          else (up.length, del.length, ins.length) match {
            case (1, 0, 1) => Some("upsert")
            case (1, 0, 0) => Some("update_only")
            case (0, 0, 1) => Some("insert_only")
            case (0, 1, 0) => Some("delete_matched")
            case _ => None
          }
        fastShape match {
          case Some(shape) =>
            GraftMergeCommand(path, source, keys, shape, tableOf(target),
              evolve = m.withSchemaEvolution)
          case None =>
            // rich lowering: every clause becomes (kind, by-name
            // condition Column, by-name assignment Columns), with
            // target/source attributes disambiguated by the __t_/__s_
            // prefixes the command's side-tagged join frame carries
            def lowCol(e: Expression): org.apache.spark.sql.Column =
              GraftSqlAccess.column(byNameSided(e, target, source))
            def lowAssigns(assigns: Seq[Assignment])
                : Seq[(String, org.apache.spark.sql.Column)] =
              assigns.map {
                case Assignment(k: AttributeReference, v) =>
                  k.name -> lowCol(v)
                case Assignment(k, _) =>
                  refuse(s"nested-field assignment to $k")
              }
            // a star clause lowers to assigns=None so the command
            // copies EVERY output column from the source — which
            // under WITH SCHEMA EVOLUTION includes the source-only
            // columns the analyzer's star expansion (over the
            // pre-evolution target schema) cannot name. UpdateAction
            // records star origin (`fromStar`); InsertAction does
            // not, so a star-shaped explicit list is treated as star
            // only when evolution asked for the extra columns.
            def lowMatched(a: Any): GraftMergeClause = a match {
              case UpdateStarAction(c) =>
                GraftMergeClause("update", c.map(lowCol), None)
              case UpdateAction(c, _, true) =>
                GraftMergeClause("update", c.map(lowCol), None)
              case UpdateAction(c, as, _) =>
                GraftMergeClause("update", c.map(lowCol),
                  Some(lowAssigns(as)))
              case DeleteAction(c) =>
                GraftMergeClause("delete", c.map(lowCol), None)
              case other => refuse(s"unsupported WHEN MATCHED action")
            }
            def lowNotMatched(a: Any): GraftMergeClause = a match {
              case InsertStarAction(c) =>
                GraftMergeClause("insert", c.map(lowCol), None)
              case InsertAction(c, as)
                  if m.withSchemaEvolution && starLike(as) =>
                GraftMergeClause("insert", c.map(lowCol), None)
              case InsertAction(c, as) =>
                GraftMergeClause("insert", c.map(lowCol),
                  Some(lowAssigns(as)))
              case other =>
                refuse(s"unsupported WHEN NOT MATCHED action")
            }
            def lowNmbs(a: Any): GraftMergeClause = a match {
              case DeleteAction(c) =>
                GraftMergeClause("delete", c.map(lowCol), None)
              case UpdateAction(c, as, _) =>
                GraftMergeClause("update", c.map(lowCol),
                  Some(lowAssigns(as)))
              case other => refuse(
                "unsupported WHEN NOT MATCHED BY SOURCE action " +
                  "(UPDATE SET * has no source row to copy)")
            }
            GraftMergeRichCommand(path, source, keys,
              matched.map(lowMatched), notMatched.map(lowNotMatched),
              notMatchedBySource.map(lowNmbs), tableOf(target),
              evolve = m.withSchemaEvolution)
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
    table: Option[org.apache.spark.sql.catalyst.TableIdentifier],
    evolve: Boolean = false)
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
    // merge verb refuses any remaining drift loudly. Under WITH
    // SCHEMA EVOLUTION the source's EXTRA columns ride along (the
    // analyzer expands SET */INSERT * over the existing target
    // columns only and leaves evolution to the command — the verb's
    // evolveSchema contract adds them metadata-only, old rows
    // reading null); without it they drop, per plain star semantics.
    val extras =
      if (evolve && shape != "delete_matched")
        renamed.columns.toSeq.filterNot(table0.columns.contains)
      else Seq.empty
    val src =
      if (shape == "delete_matched")
        renamed.select(keyCols.map(k =>
          col(k).cast(table0.schema(k).dataType).as(k)): _*)
      else renamed.select(table0.schema.fields.toSeq.map(f =>
        col(f.name).cast(f.dataType).as(f.name)) ++
        extras.map(col): _*)
    // SQL MERGE cardinality: a target row matched by MORE THAN ONE
    // source row is ambiguous for the matched verbs — which image
    // wins is undefined, and the keyed-merge engine would land BOTH
    // rows (silent key duplication). Refuse loudly, like Delta's
    // multiple-source-rows-matched error and this repo's Update-mode
    // sink (ADVICE r16 #2). Only keys that EXIST in the target count:
    // duplicate not-matched keys legitimately both insert (SQL
    // allows it — insert_only skips the check entirely). One
    // churn-sized semi-join + aggregation on the key columns.
    if (shape != "insert_only") {
      val dup = src.select(keyCols.map(col): _*)
        .join(table0.select(keyCols.map(col): _*), keyCols, "left_semi")
        .groupBy(keyCols.map(col): _*).count()
        .filter(col("count") > 1).limit(1).collect()
      if (dup.nonEmpty)
        throw new IllegalStateException(
          "graft MERGE INTO: multiple source rows matched target key " +
            s"(${keyCols.mkString(",")}) = " +
            s"(${dup.head.toSeq.init.mkString(",")}) — which image " +
            "wins is undefined; de-duplicate the source (e.g. " +
            "GROUP BY the merge keys) so each target row matches at " +
            "most one source row")
    }
    val ev = extras.nonEmpty
    shape match {
      case "upsert" =>
        SnapshotTable.merge(src, path, keyCols, evolveSchema = ev)
      case "update_only" =>
        SnapshotTable.merge(
          src.join(table0.select(keyCols.map(col): _*),
            keyCols, "left_semi"),
          path, keyCols, evolveSchema = ev)
      case "insert_only" =>
        SnapshotTable.merge(
          src.join(table0.select(keyCols.map(col): _*),
            keyCols, "left_anti"),
          path, keyCols, evolveSchema = ev)
      case "delete_matched" =>
        SnapshotTable.merge(table0.filter(lit(false)), path, keyCols,
          removeKeys = Some(src))
    }
    GraftMergeCommand.syncCatalog(spark, path, table, evolved = ev)
    Seq.empty
  }
}

object GraftMergeCommand {
  /** Post-DML catalog upkeep shared by the merge commands: drop the
    * cached relation, and after a SCHEMA-EVOLVING commit re-record
    * the catalog table's data schema — the catalog pinned the
    * creation-time schema as user-specified, and the next resolve
    * would refuse the mismatch against the table's evolved reality
    * (exactly what ALTER TABLE ADD COLUMNS would have recorded, had
    * Spark allowed it on this source). */
  private[plans] def syncCatalog(spark: SparkSession, path: String,
      table: Option[org.apache.spark.sql.catalyst.TableIdentifier],
      evolved: Boolean): Unit = {
    table.foreach { t =>
      val cat = spark.sessionState.catalog
      if (evolved) {
        val now = SnapshotTable.read(spark, path).schema
        if (cat.getTableMetadata(t).dataSchema != now)
          cat.alterTableDataSchema(t, now)
      }
      cat.refreshTable(t)
    }
    spark.catalog.refreshByPath(path)
  }
}

/** One lowered MERGE clause: `kind` ∈ update|delete|insert, `cond`
  * the clause's AND-condition (None = unconditional), `assigns` the
  * explicit assignment list as (target column → by-name value
  * Column); None = the star shape (every target column from its
  * same-named source column). All Columns reference the `__t_`/`__s_`
  * side-tagged names of [[GraftMergeRichCommand]]'s join frames. */
case class GraftMergeClause(kind: String,
    cond: Option[org.apache.spark.sql.Column],
    assigns: Option[Seq[(String, org.apache.spark.sql.Column)]])

/** The RICH `MERGE INTO` shapes — clause conditions, explicit SET /
  * INSERT lists, `WHEN NOT MATCHED BY SOURCE`, merge-key
  * reassignment — still as ONE keyed-merge manifest commit.
  *
  * Semantics (SQL): each row goes to the FIRST clause of its section
  * whose condition holds; a row no clause claims is untouched. The
  * sections partition the row space by the ON keys:
  *  - MATCHED = source ⋈ target (inner on the keys) — a target row
  *    matched by MORE THAN ONE claiming source row refuses loudly
  *    (the cardinality rule; rows claimed by no clause don't count);
  *  - NOT MATCHED = source rows whose key is absent from the target
  *    (left-anti on the target's key projection, churn-sized);
  *  - NOT MATCHED BY SOURCE = target rows whose key is absent from
  *    the source (left-anti the other way — the sync-two-tables
  *    idiom, delete/update rows the source no longer carries).
  *
  * All three sections' update/insert images project to the table's
  * exact schema and UNION into one upsert frame; delete rows
  * contribute their keys to one removeKeys frame; a single
  * [[SnapshotTable.merge]] commits everything atomically. An UPDATE
  * clause assigning a merge KEY re-keys the row: the original key
  * joins the removals (a key in both sets upserts — so an unchanged
  * key is a no-op and a changed key moves the row), which is how
  * Delta-style key updates land on a keyed-merge engine.
  *
  * Scale: the joins shuffle on the merge keys; the matched join's
  * target side is the full table read ONCE (images are needed to
  * build conditional updates — the same scan Delta's merge performs),
  * the NOT-MATCHED anti-join touches only the target's key columns
  * (column-pruned scan), and everything downstream is churn-sized. */
case class GraftMergeRichCommand(path: String, source: LogicalPlan,
    keys: Seq[(String, String)],
    matched: Seq[GraftMergeClause],
    notMatched: Seq[GraftMergeClause],
    notMatchedBySource: Seq[GraftMergeClause],
    table: Option[org.apache.spark.sql.catalyst.TableIdentifier],
    evolve: Boolean = false)
  extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.{Column, DataFrame}
    import org.apache.spark.sql.functions.{col, lit, when}
    import org.apache.spark.sql.types.StructField
    val t0 = SnapshotTable.read(spark, path)
    val keyColsT = keys.map(_._1)
    val keyType = (k: String) => t0.schema(k).dataType
    def tp(c: String) = "__t_" + c
    def sp(c: String) = "__s_" + c
    val srcDf = GraftSqlAccess.ofRows(spark, source)
    // WITH SCHEMA EVOLUTION: the output schema extends with the
    // source's extra columns (added metadata-only by the verb's
    // evolveSchema contract); rows with no source side — NMBS
    // updates, explicit-list images — read them as null
    val extraFields =
      if (!evolve) Seq.empty
      else srcDf.schema.fields.toSeq
        .filterNot(f => t0.columns.contains(f.name))
    val isNew = extraFields.map(_.name).toSet
    val fieldsT = t0.schema.fields.toSeq ++ extraFields
    val starNeeds = (matched ++ notMatched)
      .filter(c => c.kind != "delete" && c.assigns.isEmpty)
    if (starNeeds.nonEmpty)
      fieldsT.foreach(f => require(srcDf.columns.contains(f.name),
        s"graft MERGE INTO: UPDATE/INSERT * needs source column " +
          s"${f.name} (source has [${srcDf.columns.mkString(",")}])"))
    val tP = t0.select(t0.columns.toSeq.map(c => col(c).as(tp(c))): _*)
    val sP = srcDf.select(
      srcDf.columns.toSeq.map(c => col(c).as(sp(c))): _*)
    val joinCond = keys.map { case (tk, sk) =>
      col(tp(tk)) === col(sp(sk)) }.reduce(_ && _)
    // first clause whose condition holds claims the row; -1 = none
    def clauseIdx(clauses: Seq[GraftMergeClause]): Column =
      clauses.zipWithIndex.foldLeft(Option.empty[Column]) {
        case (acc, (cl, i)) =>
          val c = cl.cond.getOrElse(lit(true))
          Some(acc.fold(when(c, lit(i)))(_.when(c, lit(i))))
      }.map(_.otherwise(lit(-1))).getOrElse(lit(-1))
    def kindIdx(clauses: Seq[GraftMergeClause], kind: String): Seq[Int] =
      clauses.zipWithIndex.collect { case (c, i) if c.kind == kind => i }
    // the update/insert image, projected to the table's exact schema:
    // per clause — star copies the same-named source column, an
    // explicit list applies its assignments over the fallback (target
    // image for updates, NULL for inserts)
    def image(clauses: Seq[GraftMergeClause], idxs: Seq[Int],
        fallback: StructField => Column)(f: StructField): Column = {
      val pick = idxs.foldLeft(Option.empty[Column]) { (acc, i) =>
        val v: Column = clauses(i).assigns match {
          case None => col(sp(f.name))
          case Some(as) =>
            as.find(_._1 == f.name).map(_._2).getOrElse(fallback(f))
        }
        Some(acc.fold(when(col("__idx") === i, v))(
          _.when(col("__idx") === i, v)))
      }
      pick.get.otherwise(fallback(f)).cast(f.dataType).as(f.name)
    }
    def keyFrame(df: DataFrame, of: String => String): DataFrame =
      df.select(keyColsT.map(k =>
        col(of(k)).cast(keyType(k)).as(k)): _*)
    // delete-only shapes: an empty update frame in the TABLE's own
    // schema (no evolution rides a merge that lands no images)
    val emptyRows = t0.filter(lit(false))

    var upserts = Seq.empty[DataFrame]
    var removals = Seq.empty[DataFrame]

    if (matched.nonEmpty) {
      val mUp = kindIdx(matched, "update")
      val mDel = kindIdx(matched, "delete")
      val mActive = sP.join(tP, joinCond, "inner")
        .withColumn("__idx", clauseIdx(matched))
        .filter(col("__idx") >= 0)
      // cardinality: two CLAIMING source rows on one target key is
      // ambiguous — refuse like Delta and the Update-mode sink (rows
      // no clause claims were already filtered and don't count)
      val dup = mActive.groupBy(keyColsT.map(k => col(tp(k))): _*)
        .count().filter(col("count") > 1).limit(1).collect()
      if (dup.nonEmpty)
        throw new IllegalStateException(
          "graft MERGE INTO: multiple source rows matched target key " +
            s"(${keyColsT.mkString(",")}) = " +
            s"(${dup.head.toSeq.init.mkString(",")}) — which clause " +
            "image wins is undefined; de-duplicate the source or " +
            "tighten the clause conditions so each target row is " +
            "claimed by at most one source row")
      if (mUp.nonEmpty)
        upserts :+= mActive.filter(col("__idx").isin(mUp: _*))
          .select(fieldsT.map(
            image(matched, mUp, f =>
              if (isNew(f.name)) lit(null).cast(f.dataType)
              else col(tp(f.name)))): _*)
      if (mDel.nonEmpty)
        removals :+= keyFrame(
          mActive.filter(col("__idx").isin(mDel: _*)), tp)
      // a clause that REASSIGNS a merge key moves the row: its
      // ORIGINAL key joins the removals (an unchanged key upserts —
      // updates win over removals in the same commit — so this is a
      // no-op unless the key actually changed)
      val rekeyIdx = mUp.filter(i => matched(i).assigns
        .exists(_.exists(a => keyColsT.contains(a._1))))
      if (rekeyIdx.nonEmpty)
        removals :+= keyFrame(
          mActive.filter(col("__idx").isin(rekeyIdx: _*)), tp)
    }
    if (notMatched.nonEmpty) {
      val tKeys = tP.select(keyColsT.map(k => col(tp(k))): _*)
      val nmActive = sP.join(tKeys, joinCond, "left_anti")
        .withColumn("__idx", clauseIdx(notMatched))
        .filter(col("__idx") >= 0)
      val nmIns = kindIdx(notMatched, "insert")
      upserts :+= nmActive.filter(col("__idx").isin(nmIns: _*))
        .select(fieldsT.map(
          image(notMatched, nmIns,
            f => lit(null).cast(f.dataType))): _*)
    }
    if (notMatchedBySource.nonEmpty) {
      val sKeys = sP.select(keys.map { case (_, sk) => col(sp(sk)) }: _*)
      val nmsActive = tP.join(sKeys, joinCond, "left_anti")
        .withColumn("__idx", clauseIdx(notMatchedBySource))
        .filter(col("__idx") >= 0)
      val nUp = kindIdx(notMatchedBySource, "update")
      val nDel = kindIdx(notMatchedBySource, "delete")
      if (nUp.nonEmpty)
        upserts :+= nmsActive.filter(col("__idx").isin(nUp: _*))
          .select(fieldsT.map(
            image(notMatchedBySource, nUp, f =>
              if (isNew(f.name)) lit(null).cast(f.dataType)
              else col(tp(f.name)))): _*)
      if (nDel.nonEmpty)
        removals :+= keyFrame(
          nmsActive.filter(col("__idx").isin(nDel: _*)), tp)
      val rekeyIdx = nUp.filter(i => notMatchedBySource(i).assigns
        .exists(_.exists(a => keyColsT.contains(a._1))))
      if (rekeyIdx.nonEmpty)
        removals :+= keyFrame(
          nmsActive.filter(col("__idx").isin(rekeyIdx: _*)), tp)
    }
    val upFrame = upserts.reduceOption(_.unionByName(_))
      .getOrElse(emptyRows)
    val remFrame =
      if (removals.isEmpty) None
      else Some(removals.reduce(_.unionByName(_)))
    SnapshotTable.merge(upFrame, path, keyColsT, removeKeys = remFrame,
      evolveSchema = extraFields.nonEmpty && upserts.nonEmpty)
    GraftMergeCommand.syncCatalog(spark, path, table,
      evolved = extraFields.nonEmpty && upserts.nonEmpty)
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
    // overwrite below ([[SnapshotTable.replacePartitions]]: touched
    // partitions' entries drop + staged files land, everything else
    // passes through by reference, ONE commit). Spark's default
    // (STATIC, no partition spec) IS whole-table replacement, which
    // the overwrite branch matches; on a non-partitioned table the
    // mode has no meaning and static semantics apply, as in Spark.
    val dynamic = overwrite &&
      SnapshotTable.partitioning(spark, path).nonEmpty &&
      spark.conf.get("spark.sql.sources.partitionOverwriteMode",
        "static").equalsIgnoreCase("dynamic")
    if (dynamic) SnapshotTable.replacePartitions(df, path)
    else if (overwrite) SnapshotTable.overwrite(df, path)
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
