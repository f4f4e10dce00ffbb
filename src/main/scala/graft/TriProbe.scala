package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (not part of the driver contract): stage-level timing
  * of the g4/g7 triangle pipeline — edge derivation vs id assignment
  * vs orientation vs the wedge join — so the optimization round knows
  * WHICH stage to attack (guide §1.1 empirical loop). Timed with the
  * noop sink (§1.4) so nothing is pruned.
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tri] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (round <- 1 to 2) {
      println(s"--- round $round")
      val ps = Tables(spark, sfDir, "lineitem")
        .select(col("l_partkey").as("p"), col("l_suppkey").as("k"))
        .distinct()
      time("ps distinct")(noop(ps))
      time("self-join numeric")(noop(ps.as("x").join(ps.as("y"),
          col("x.p") === col("y.p") && col("x.k") < col("y.k"))
        .select(col("x.k").as("ka"), col("y.k").as("kb"))))
      val distinctPairs = ps.as("x").join(ps.as("y"),
          col("x.p") === col("y.p") && col("x.k") < col("y.k"))
        .select(col("x.k").as("ka"), col("y.k").as("kb"))
        .distinct()
      time("+ numeric distinct")(noop(distinctPairs))
      val edges = distinctPairs
        .select(
          least(concat(lit("s"), col("ka")), concat(lit("s"), col("kb")))
            .as("src"),
          greatest(concat(lit("s"), col("ka")), concat(lit("s"), col("kb")))
            .as("dst"))
        .filter(conv(substring(md5(concat(col("src"), lit("|"),
            col("dst"))), 1, 15), 16, 10).cast("long") % 10 === 0)
      time("+ strings + md5 = edges")(noop(edges))
      val tri = time("triangleCounts CONSTRUCT")(
        graft.operators.Graph.triangleCounts(edges))
      time("triangleCounts EXECUTE")(noop(tri))
      time("orderBy(node) on top")(noop(tri.orderBy(col("node"))))
    }
    spark.stop()
  }
}
