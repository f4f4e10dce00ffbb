package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Scratch probe (not part of the driver contract): per-verb wall time
  * of the SnapshotTable lifecycle at sf0.1 — create / append / CoW
  * delete / MoR delete / merge / read — so the optimization round sees
  * which verb constants dominate the ~35 w-family lifecycle queries.
  */
object SnapVerbProbe {
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
    spark.read.parquet(s"$sfDir/orders.parquet").count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[snap] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"--- round $round")
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_snapverb_$round").toString
      val path = s"$base/orders"
      val orders = Tables(spark, sfDir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      time("create (flat)")(SnapshotTable.create(orders, path))
      time("append")(SnapshotTable.append(
        orders.filter(col("o_orderkey") % 7 === 0), path))
      time("delete CoW")(SnapshotTable.delete(spark, path,
        col("o_orderkey") % 10 === 3L))
      time("delete MoR")(SnapshotTable.deleteMoR(spark, path,
        col("o_orderkey") % 10 === 7L))
      time("merge keyed")(SnapshotTable.merge(
        orders.filter(col("o_orderkey") % 11 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        path, Seq("o_orderkey")))
      time("read + count")(SnapshotTable.read(spark, path).count())
      time("metadataTable")(SnapshotTable.metadataTable(spark, path)
        .count())
      val pPath = s"$base/orders_part"
      time("create (partitioned)")(SnapshotTable.create(
        orders.repartitionByRange(4, col("o_orderkey"))
          .sortWithinPartitions(col("o_orderkey")),
        pPath, partitionBy = Seq("o_orderpriority")))
      time("partitioned delete CoW")(SnapshotTable.delete(spark, pPath,
        col("o_orderkey") % 10 === 3L))
    }
    spark.stop()
  }
}
