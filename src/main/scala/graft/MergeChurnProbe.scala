package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Snapshot-MERGE churn probe (not part of the driver contract):
  * validates the copy-on-write claim that merge cost scales with the
  * CHURN a merge touches, not table size — the property that makes
  * point updates viable on a 100 TB table. One 10M-row table laid out
  * two ways:
  *
  *  - key-clustered (repartitionByRange on the merge key, 64 files):
  *    a 0.1% contiguous-key update lands in ~1 file → ~1 file
  *    rewritten;
  *  - key-scattered (hash repartition, 64 files): the same 0.1% of
  *    keys hits every file → full-table rewrite.
  *
  * Identical update set, identical table bytes; the printed ratio is
  * the value of clustering alone, and `filesRewritten` makes the
  * pruning observable, not inferred.
  *
  * Run: SPARK_GRAFT_CHURN_ROWS=10000000 sbt "runMain graft.MergeChurnProbe"
  */
object MergeChurnProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_CHURN_ROWS", "10000000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.range(rows).select(col("id"),
      (pmod(hash(col("id")), lit(10000)) / lit(100.0)).as("x"),
      concat(lit("payload_"), col("id")).as("s"))
    val updates = spark.range(rows / 1000).select(col("id"), // keys 0..0.1%
      lit(-1.0).as("x"), lit("updated").as("s"))

    def run(name: String, clustered: Boolean): Unit = {
      val path = java.nio.file.Files
        .createTempDirectory(s"churn_$name").toString + "/t"
      val laid =
        if (clustered) base.repartitionByRange(64, col("id"))
          .sortWithinPartitions(col("id"))
        else base.repartition(64)
      SnapshotTable.create(laid, path)
      val m0 = manifest(spark, path, 0)
      val t0 = System.nanoTime()
      SnapshotTable.merge(updates, path, Seq("id"))
      val sec = (System.nanoTime() - t0) / 1e9
      val m1 = manifest(spark, path, 1)
      val rewritten = m0.count(f => !m1.contains(f))
      val n = SnapshotTable.read(spark, path).count()
      require(n == rows, s"row count drifted: $n")
      println(f"PROBE merge $name%-12s ${sec}%6.2f s  " +
        f"filesRewritten=$rewritten/${m0.size}  newFiles=${m1.diff(m0).size}")
    }
    // warmup: a throwaway merge absorbs codegen/classloading so the
    // first timed case isn't penalized by JVM cold start
    locally {
      val p = java.nio.file.Files.createTempDirectory("churn_warm")
        .toString + "/t"
      SnapshotTable.create(spark.range(1000).toDF("id")
        .withColumn("x", lit(0.0)).withColumn("s", lit("w")), p)
      SnapshotTable.merge(spark.range(10).toDF("id")
        .withColumn("x", lit(1.0)).withColumn("s", lit("u")), p, Seq("id"))
    }
    run("clustered", clustered = true)
    run("scattered", clustered = false)
    spark.stop()
  }

  private def manifest(spark: SparkSession, path: String, v: Int): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path, f"_graft_log/v$v%08d.manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in).getLines().toList
    finally in.close()
  }
}
