package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit (not part of the driver contract): prints the
  * physical join/exchange/codegen summary for harness queries so plan
  * regressions (a broadcast turning into a sort-merge join, an
  * all-pairs join creeping in, a scan reading every column) are
  * visible without spelunking the UI.
  *
  * Run: SPARK_GRAFT_AUDIT_QUERIES=t6_bm25,t7_decontaminate \
  *   sbt "runMain graft.PlanAudit" [sfDir]
  * Default: every query, sf0.001.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val wanted = sys.env.get("SPARK_GRAFT_AUDIT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => wanted.forall(_.contains(n)))
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        val lines = plan.split("\n")
        def n(marker: String) = lines.count(_.contains(marker))
        println(f"AUDIT $name%-24s bhj=${n("BroadcastHashJoin")}" +
          f" smj=${n("SortMergeJoin")} bnlj=${n("BroadcastNestedLoopJoin")}" +
          f" cart=${n("CartesianProduct")} exch=${n("Exchange")}" +
          f" wscg=${n("WholeStageCodegen")}")
        lines.filter(_.contains("ReadSchema")).foreach(l =>
          println("  " + l.trim.replaceAll(".*ReadSchema: ", "scan ")
            .take(140)))
      } catch {
        case e: Exception =>
          println(s"AUDIT $name ERROR ${e.getClass.getSimpleName}: " +
            e.getMessage.takeWhile(_ != '\n').take(120))
      }
    }
    spark.stop()
  }
}
