package graft

import org.apache.spark.sql.SparkSession

import graft.sources.SnapshotTable

/** Time the staged-commit path as a function of STAGED FILE COUNT: the
  * per-file rename + footer-harvest loop in stage() runs sequentially
  * on the driver, so its cost should scale linearly with files/commit
  * while the write job itself parallelizes (guide §5 "the driver
  * should do almost no data work", §7.3 commit-protocol frames).
  */
object StageScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val orders = Tables(spark, sfDir, "orders")
    orders.count()
    val base = java.nio.file.Files
      .createTempDirectory("stage_scale_probe").toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    for (files <- Seq(1, 4, 16, 64, 256); rep <- 1 to 3) {
      val dir = s"$base/t_${files}_$rep"
      val t0 = System.nanoTime()
      SnapshotTable.create(orders.repartition(files), dir)
      val s = (System.nanoTime() - t0) / 1e9
      println(f"create files=$files%4d rep=$rep: $s%7.3f s")
    }
    spark.stop()
  }
}
