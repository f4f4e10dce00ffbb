package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for every declared query (or a
  * comma-separated allowlist in SPARK_GRAFT_PLAN_ONLY) to the directory
  * given as arg 0 (default /tmp/plans), one `<query>.txt` per query —
  * the optimization rounds' plan-evidence harness (guide §1: capture
  * plan shape — Exchange count, join strategy, PushedFilters/ReadSchema
  * — before and after each change).
  *
  * Lifecycle queries (the st- and snapshot-table families) EXECUTE their
  * imperative body while the DataFrame is being constructed; their dump
  * is the plan of the final read, which is still the graded scan shape.
  * Data dir arg 1 (default sf0.01 — plan shapes, not timings).
  */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(if (args.length > 0) args(0) else "/tmp/plans")
    val dataDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = sys.env.get("SPARK_GRAFT_PLAN_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    for ((name, fn) <- named) {
      try {
        val plan = fn(spark, dataDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(outDir.resolve(s"$name.txt"),
          plan.getBytes("UTF-8"))
        val exchanges = plan.linesIterator.count(_.contains("Exchange"))
        println(s"$name: exchanges=$exchanges")
      } catch { case e: Throwable =>
        println(s"$name: FAILED ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").take(120))
      }
    }
    spark.stop()
  }
}
