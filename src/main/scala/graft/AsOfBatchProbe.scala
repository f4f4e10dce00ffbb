package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.AsOfJoin

/** Focused probe for [[graft.plans.AsOfJoinExec]]'s OUTPUT PATH cost
  * (not part of the driver contract): times the native as-of join on
  * pre-clustered 10M-row inputs with whole-stage codegen ON (the fused
  * merge loop feeding variables to consume()) and OFF (the interpreted
  * doExecute iterator — the fallback Spark uses when a stage exceeds
  * the codegen field limit or codegen fails). The interpreted path is
  * where per-row output assembly (row joining + projection) shows up;
  * the codegen path bounds how much the fallback matters.
  *
  * Run: SPARK_GRAFT_ASOF_ROWS=10000000 sbt "runMain graft.AsOfBatchProbe"
  */
object AsOfBatchProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_ASOF_ROWS", "10000000").toLong
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_ASOF_RUNS", "3").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val events = spark.range(rows).select(
      (col("id") % 200000).as("entity"),
      add_months(lit("2015-01-01").cast(DateType),
        pmod(hash(col("id")), lit(60)).cast(IntegerType)).as("mois"),
      (pmod(hash(col("id") + 1), lit(10000)) / lit(100.0)).as("amount"))
    val left = events.groupBy(col("entity"), col("mois"))
      .agg(count(lit(1)).as("n")).withColumnRenamed("mois", "d")
      .repartition(col("entity")).localCheckpoint()
    // eight value columns: output assembly (null-checked field copies
    // into the result row) scales with value-column count, so a wide
    // right side is where row-at-a-time production would show
    val snaps = events.filter(col("amount") > 99.0)
      .groupBy(col("entity"), col("mois").as("d"))
      .agg(max(col("amount")).as("snap"),
        (1 to 7).map(i => sum(col("amount") * i).as(s"v$i")): _*)
      .repartition(col("entity")).localCheckpoint()
    println(s"left=${left.count()} snaps=${snaps.count()}")

    def timeIt(name: String, codegen: Boolean): Unit = {
      spark.conf.set("spark.sql.codegen.wholeStage", codegen.toString)
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        // consume EVERY value column (a bare filter+count lets
        // PruneAsOfJoinValues delete v1..v7 from the join entirely)
        val joined = AsOfJoin.mergeAsOfNative(left, snaps, "d", Seq("entity"),
          Some(92), "backward")
        val n = joined.agg(
            count(when(col("snap").isNotNull, 1)).as("n"),
            (1 to 7).map(i => sum(col(s"v$i")).as(s"s$i")): _*)
          .collect()(0).getLong(0)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      once() // warmup
      val rs = (1 to runsPer).map(_ => once())
      require(rs.map(_._2).distinct.size == 1, "row counts diverged")
      println(f"PROBE $name%-34s best ${rs.map(_._1).min}%6.2f s  " +
        f"runs=[${rs.map(r => f"${r._1}%.2f").mkString(",")}]  rows=${rs.head._2}")
    }
    timeIt("native as-of, codegen ON", codegen = true)
    timeIt("native as-of, codegen OFF", codegen = false)
    spark.stop()
  }
}
