package graft

import org.apache.spark.sql.{SparkSession, functions => F}

/** Probe: does dynamic partition pruning fire against a
  * [[graft.sources.GraftFileIndex]]-backed scan, and under which dim
  * shapes (local relation vs file-backed dim)? Prints the optimized
  * plan (DynamicPruning subquery present?) and the executed scan's
  * file metrics. */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("dppdbg").toString
    val path = base + "/t"
    val rows = (0L until 4000L).map(i => (i, s"g${i % 8}", i * 3))
      .toDF("id", "grp", "score")
    graft.sources.SnapshotTable.create(rows, path, partitionBy = Seq("grp"))
    graft.sources.SnapshotTable.readCatalyst(spark, path)
      .createOrReplaceTempView("fact_cat")
    Seq(("g1", 1), ("g5", 1)).toDF("grp", "flag")
      .createOrReplaceTempView("dim_local")
    Seq(("g1", 1), ("g5", 1)).toDF("grp", "flag").write
      .mode("overwrite").parquet(base + "/dim")
    spark.read.parquet(base + "/dim").createOrReplaceTempView("dim_file")
    for (dim <- Seq("dim_local", "dim_file")) {
      val dpp = spark.sql(
        s"""SELECT f.grp, count(*) AS n FROM fact_cat f
           |JOIN $dim d ON f.grp = d.grp WHERE d.flag = 1
           |GROUP BY 1""".stripMargin)
      println(s"=== $dim OPTIMIZED ===")
      println(dpp.queryExecution.optimizedPlan.treeString.take(3000))
      dpp.collect()
      println(s"=== $dim EXECUTED (truncated) ===")
      println(dpp.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
