package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft")` / `df.write.format("graft")` — the
  * snapshot table as a registered Spark data source, so the library's
  * lakehouse surface composes with plain DataFrameReader/Writer code
  * (and `CREATE TABLE ... USING graft` style tooling) instead of
  * requiring the [[SnapshotTable]] API.
  *
  * Read options: `versionAsOf` (int), `timestampAsOf` (epoch millis
  * or `yyyy-MM-dd HH:mm:ss`). The relation implements
  * [[PrunedFilteredScan]]: pushed filters translate to a Column
  * predicate and ride [[SnapshotTable.readWhere]] — i.e. the full
  * manifest machinery (partition values, cached ranges, byte bounds,
  * bloom sidecars, segment-level refutation, the distributed planning
  * path) prunes files before any task launches; untranslatable
  * filters are simply not pushed (Spark re-applies every filter above
  * a V1 source, so partial pushdown is always sound). Deletion
  * vectors, column mapping and schema evolution all apply — the scan
  * delegates to the library's own readers.
  *
  * Write modes: ErrorIfExists/Ignore → create (`partitionBy` option:
  * comma-separated columns), Append → append (`mergeSchema=true` for
  * additive evolution), Overwrite → overwrite.
  */
class GraftDataSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def opt(parameters: Map[String, String],
      key: String): Option[String] =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(key) => v
    }

  private def pathOf(parameters: Map[String, String]): String =
    opt(parameters, "path").getOrElse(
      sys.error("graft: 'path' required — use .load(path)/.save(path)"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    val version = opt(parameters, "versionAsOf").map(_.toInt)
      .orElse(opt(parameters, "timestampAsOf").map { ts =>
        val millis =
          if (ts.forall(_.isDigit)) ts.toLong
          else java.sql.Timestamp.valueOf(ts).getTime
        SnapshotTable.versionAsOf(spark, path, millis)
      })
      .getOrElse(SnapshotTable.versions(spark, path).max)
    new GraftRelation(sqlContext, path, version)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    val exists = SnapshotTable.versions(spark, path).nonEmpty
    val partitionBy = opt(parameters, "partitionBy")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      .getOrElse(Seq.empty)
    mode match {
      case SaveMode.ErrorIfExists =>
        require(!exists, s"graft table already exists at $path")
        SnapshotTable.create(data, path, partitionBy)
      case SaveMode.Ignore =>
        if (!exists) SnapshotTable.create(data, path, partitionBy)
      case SaveMode.Append =>
        if (!exists) SnapshotTable.create(data, path, partitionBy)
        else SnapshotTable.append(data, path, evolveSchema =
          opt(parameters, "mergeSchema").exists(_.toBoolean))
      case SaveMode.Overwrite =>
        if (!exists) SnapshotTable.create(data, path, partitionBy)
        else SnapshotTable.overwrite(data, path)
    }
    createRelation(sqlContext,
      parameters.filterNot(_._1.equalsIgnoreCase("versionAsOf")))
  }
}

/** The snapshot table as a V1 relation: filters and projections push
  * into [[SnapshotTable.readWhere]]'s metadata pruning. */
private class GraftRelation(ctx: SQLContext, path: String, version: Int)
  extends BaseRelation with PrunedFilteredScan {

  override def sqlContext: SQLContext = ctx

  override val schema: StructType =
    SnapshotTable.read(ctx.sparkSession, path, Some(version)).schema

  /** Exact Column translation of a V1 filter; None = cannot push
    * (sound — Spark re-applies every filter above a V1 scan). An And
    * may push one translated side (a superset of matching rows);
    * Or/Not require complete, exact translations of their children. */
  private def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case And(l, r) => (toColumn(l), toColumn(r)) match {
      case (Some(a), Some(b)) => Some(a && b)
      case (one, other) => one.orElse(other)
    }
    case Or(l, r) => for { a <- toColumn(l); b <- toColumn(r) }
      yield a || b
    case Not(c) => toColumn(c).map(!_)
    case _ => None
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    val spark = ctx.sparkSession
    val pred = filters.flatMap(toColumn).reduceOption(_ && _)
    val base = pred match {
      case Some(p) =>
        SnapshotTable.readWhere(spark, path, p, Some(version))
      case None => SnapshotTable.read(spark, path, Some(version))
    }
    base.select(requiredColumns.toSeq.map(col): _*).rdd
  }
}
