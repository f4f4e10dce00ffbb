package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** a17 evidence probe (r18): the optimized sampledQuantilesByGroup
  * hides its hash projection behind the barrier (`Scan ExistingRDD` in
  * the query's own dump), so — per the r17 verdict's evidence note —
  * this dumps the sub-plan BELOW the barrier and counts its md5
  * occurrences: the one-md5-per-row claim is checkable in-tree.
  * Also noop-times (guide §1.4) the two halves: the below-barrier
  * hash projection and the full query. Not part of the driver
  * contract. */
object A17Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val outDir = Paths.get(if (args.length > 0) args(0)
      else "/tmp/a17_probe")
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the exact below-barrier projection sampledQuantilesByGroup
    // materializes (same table, same key recipe as the a17 entry)
    val li = Tables(spark, sfDir, "lineitem")
    val keyCol = concat_ws("_", col("l_orderkey"), col("l_linenumber"),
      col("l_partkey"), col("l_suppkey"))
    val hashed = li.filter(col("l_returnflag").isNotNull)
      .select(col("l_returnflag"), col("l_quantity"),
        graft.operators.Sketches.kmvHash(keyCol).as("__h"))
    val sub = hashed.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    Files.write(outDir.resolve("a17_below_barrier.txt"),
      sub.getBytes("UTF-8"))
    val md5Below = sub.linesIterator.count(_.contains("md5"))
    println(s"below-barrier plan: md5 occurrences = $md5Below " +
      s"(expect 1: one hash evaluation per row)")

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s median ${ts.sorted.apply(1)}%6.3f s " +
        f"(min ${ts.min}%6.3f)")
    }
    time("below-barrier hash pass") {
      hashed.write.format("noop").mode("overwrite").save()
    }
    time("a17 full query") {
      SparkEntry.queries("a17_sampled_quantiles")(spark, sfDir).count()
    }
    spark.stop()
  }
}
