package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Deletion-vector probe (not part of the driver contract): quantifies
  * the merge-on-read tradeoff — write-side savings vs read-side tax —
  * that motivates `deleteMoR`. One 10M-row, 64-file table:
  *
  *  1. five successive 1%-of-rows deletes, once as copy-on-write
  *     `delete` (rewrites straddling files) and once as merge-on-read
  *     `deleteMoR` (commits coordinates only) — per-delete WRITE wall
  *     compared directly;
  *  2. full-scan aggregate wall after 0 and after 5 deletes in each
  *     mode (the MoR read tax = one churn-sized anti-join), and again
  *     after `optimize` materializes the mask.
  *
  * Run: SPARK_GRAFT_DV_ROWS=10000000 tools/jrun.sh graft.DvProbe
  */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_DV_ROWS", "10000000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def base = spark.range(rows).select(col("id"),
      (col("id") % 997).as("m"),
      concat(lit("payload_"), col("id")).as("s"))

    def timeIt[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    def scanWall(path: String): Double = {
      val (_, sec) = timeIt {
        SnapshotTable.read(spark, path)
          .agg(count(lit(1)), sum(col("m"))).collect()
      }
      sec
    }

    // two delete geometries:
    //  - clustered: each 1% delete is an id RANGE, straddling ~1 of 64
    //    range-laid files (copy-on-write's best case);
    //  - scattered: each 1% delete is an id RESIDUE (id % 100 == i),
    //    touching EVERY file (copy-on-write's worst case - each delete
    //    rewrites the whole table; the case deletion vectors exist for)
    for (scattered <- Seq(false, true); mor <- Seq(false, true)) {
      val geo = if (scattered) "scattered" else "clustered"
      val tag = if (mor) "merge-on-read" else "copy-on-write"
      val path = java.nio.file.Files
        .createTempDirectory(s"dvprobe_$mor$scattered").toString + "/t"
      SnapshotTable.create(
        base.repartitionByRange(64, col("id"))
          .sortWithinPartitions("id"), path)
      val scan0 = scanWall(path)
      def dirBytes: Long = {
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        def walk(d: org.apache.hadoop.fs.Path): Long =
          fs.listStatus(d).map(st =>
            if (st.isDirectory) walk(st.getPath) else st.getLen).sum
        walk(new org.apache.hadoop.fs.Path(path, "files"))
      }
      val bytes0 = dirBytes
      var writeTotal = 0.0
      for (i <- 0 until 5) {
        val pred =
          if (scattered) col("id") % 100 === i
          else {
            val lo = rows / 100 * i
            col("id") >= lo && col("id") < (lo + rows / 100)
          }
        val (_, sec) = timeIt {
          if (mor) SnapshotTable.deleteMoR(spark, path, pred)
          else SnapshotTable.delete(spark, path, pred)
        }
        writeTotal += sec
      }
      val scan5 = scanWall(path)
      val deleteBytes = dirBytes - bytes0
      val (_, optSec) = timeIt {
        SnapshotTable.optimize(spark, path,
          targetFileBytes = 64L * 1024 * 1024)
      }
      val scanOpt = scanWall(path)
      val n = SnapshotTable.read(spark, path).count()
      require(n == rows - 5 * (rows / 100), s"row count drifted: $n")
      println(f"PROBE dv $geo%-9s $tag%-14s 5 deletes ${writeTotal}%6.2f s " +
        f"(${deleteBytes / 1024 / 1024}%5d MB written)  " +
        f"scan0 ${scan0}%5.2f  scan5 ${scan5}%5.2f  " +
        f"optimize ${optSec}%5.2f  scanAfterOpt ${scanOpt}%5.2f")
    }
    spark.stop()
  }
}
