package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.expressions.{DotProduct, JaroWinklerSimilarity}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions for SQL users and the planner strategy for the native
  * as-of join operator ([[graft.plans.AsOfJoinNode]]).
  *
  * Usage:
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT graft_dot_product(a.embedding, b.embedding) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_dot_product expects exactly 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName,
        "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_jaro_winkler expects exactly 2 arguments")
        JaroWinklerSimilarity(children.head, children(1))
      }))
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PruneAsOfJoinValues)
    // SQL INSERT INTO / INSERT OVERWRITE a `USING graft` catalog
    // table: rewrite Spark's raw file-source write (which would land
    // manifest-invisible files — the formats refuse it loudly) into a
    // manifest commit. Runs post-hoc, AFTER PreprocessTableInsertion
    // has aligned the query to the table schema.
    ext.injectPostHocResolutionRule(_ => graft.plans.RewriteGraftInserts)
    // SQL time travel (`FROM tbl VERSION AS OF n` / TIMESTAMP AS OF)
    // on graft catalog tables. Injection point matters: Spark's own
    // ResolveRelations THROWS for v1 time travel inside the
    // Resolution batch, before any extended resolution rule runs —
    // the hint-resolution batch is the one extension hook that sees
    // the plan earlier, so the claim rides there (the rule only
    // touches RelationTimeTravel over graft catalog tables).
    ext.injectHintResolutionRule(s =>
      graft.plans.ResolveGraftTimeTravel(s))
    // SQL schema evolution (ALTER TABLE ADD/RENAME/DROP/ALTER
    // COLUMN) mapped onto the metadata-only evolution verbs — same
    // early-batch injection as time travel: Spark's own Resolution
    // batch throws "v2 only" for these plans on session-catalog
    // tables before post-hoc rules run.
    ext.injectHintResolutionRule(s =>
      graft.plans.ResolveGraftAlterTable(s))
    // SQL maintenance verbs (OPTIMIZE / VACUUM / DESCRIBE HISTORY /
    // RESTORE TABLE) — a DELEGATING parser: statements whose leading
    // keyword is not a graft maintenance verb go verbatim to Spark's
    // own parser, so the grammar is additive, never shadowing.
    ext.injectParser((_, delegate) =>
      new graft.plans.GraftSqlParser(delegate))
  }
}
