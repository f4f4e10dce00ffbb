package graft
import org.apache.spark.sql.SparkSession
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("flagship_panel", "j1_equi_chain", "w3_moving_avg", "p5_filter_cols", "j6_asof_backward")) {
      println(s"===== $name")
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // print operator tree section only
      println(plan.split("\n\n")(0))
      val exchanges = plan.split("\n").count(_.contains("Exchange"))
      val scans = plan.split("\n").filter(l => l.contains("PushedFilters") || l.contains("ReadSchema"))
      println(s"-- #Exchange lines: $exchanges")
      scans.take(6).foreach(l => println("-- " + l.trim.take(150)))
    }
    spark.stop()
  }
}
