package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule

/** SQL time travel for `USING graft` catalog tables:
  * `SELECT ... FROM tbl VERSION AS OF 3` /
  * `TIMESTAMP AS OF '2026-01-01'`.
  *
  * Spark's own resolution supports the TVF-style time-travel spec
  * only for v2 catalogs and throws UNSUPPORTED_FEATURE.TIME_TRAVEL
  * for session-catalog v1 tables — so this rule runs in the SAME
  * resolution batch and claims [[RelationTimeTravel]] nodes whose
  * target is a graft-provider catalog table, replacing them with the
  * data source's own pinned relation (`versionAsOf`/`timestampAsOf`
  * options — the exact relation `spark.read.format("graft")` builds,
  * complete with the loud pinned-write refusal). Non-graft targets
  * pass through untouched for Spark's own handling/refusal. */
case class ResolveGraftTimeTravel(spark: SparkSession)
  extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, version) =>
        graftTarget(u) match {
          case None => tt
          case Some(path) =>
            val pin: Option[(String, String)] =
              version.map("versionAsOf" -> _)
                .orElse(ts.collect {
                  case e if e.foldable && e.resolved =>
                    "timestampAsOf" -> String.valueOf(e.eval())
                })
            pin match {
              case None => tt // unresolved/non-literal timestamp:
                              // leave for Spark's own error
              case Some((k, v)) =>
                val df = spark.read.format("graft").option(k, v)
                  .load(path)
                SubqueryAlias(u.multipartIdentifier.last,
                  org.apache.spark.sql.GraftSqlAccess.analyzed(df))
            }
        }
    }

  /** The storage path when the (1- or 2-part, session-catalog) name
    * resolves to a graft-provider catalog table; None otherwise. */
  private def graftTarget(u: UnresolvedRelation): Option[String] = {
    val cat = spark.sessionState.catalog
    val ident = u.multipartIdentifier match {
      case Seq(t) => Some(org.apache.spark.sql.catalyst
        .TableIdentifier(t))
      case Seq(db, t) => Some(org.apache.spark.sql.catalyst
        .TableIdentifier(t, Some(db)))
      case _ => None
    }
    ident.filter(cat.tableExists).flatMap { id =>
      val meta = cat.getTableMetadata(id)
      if (meta.provider.exists(_.equalsIgnoreCase("graft")))
        meta.storage.properties.get("path")
          .orElse(meta.storage.locationUri.map(_.toString))
      else None
    }
  }
}
