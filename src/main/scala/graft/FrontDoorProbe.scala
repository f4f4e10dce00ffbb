package graft

import org.apache.spark.sql.{functions => F, SparkSession}

import graft.sources.SnapshotTable

/** Front-door read-path probe (VERDICT r11 item 2's bench criterion):
  * the same filtered aggregate over one snapshot table, once through
  * the native `readWhere` path and once through the registered
  * `format("graft")` data source. With the r12 front door the format
  * read resolves to the SAME GraftFileIndex-backed HadoopFsRelation,
  * so the two should be within noise of each other (the criterion:
  * ≤ ~1.1×); the r11 V1 path paid row boxing + lost codegen here.
  * Prints medians of 5 after warmup, plus the executed plan's scan
  * node names as evidence. */
object FrontDoorProbe {

  private def timeMs(f: => Unit): Double = {
    val t = System.nanoTime(); f; (System.nanoTime() - t) / 1e6
  }

  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val path = java.nio.file.Files
      .createTempDirectory("frontdoor_probe").toString + "/lineitem_snap"
    val li = Tables(spark, sfDir, "lineitem").select(
      F.col("l_orderkey"), F.col("l_partkey"), F.col("l_quantity"),
      F.col("l_extendedprice"), F.col("l_shipdate"))
    SnapshotTable.create(
      li.repartitionByRange(16, F.col("l_orderkey"))
        .sortWithinPartitions(F.col("l_orderkey")), path)
    val maxK = li.agg(F.max(F.col("l_orderkey"))).head().getLong(0)
    val pred = F.col("l_orderkey") >= maxK / 2 &&
      F.col("l_orderkey") < maxK / 2 + maxK / 10
    def native(): Unit =
      SnapshotTable.readWhere(spark, path, pred)
        .agg(F.count(F.lit(1)), F.sum(F.col("l_quantity"))).collect()
    def front(): Unit =
      spark.read.format("graft").load(path).filter(pred)
        .agg(F.count(F.lit(1)), F.sum(F.col("l_quantity"))).collect()
    native(); front() // warm
    val nMs = median((0 until 5).map(_ => timeMs(native())))
    val fMs = median((0 until 5).map(_ => timeMs(front())))
    val scan = spark.read.format("graft").load(path).filter(pred)
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Scan") || l.contains("FileScan"))
      .take(2).mkString(" | ").trim
    println(f"native readWhere median: $nMs%8.1f ms")
    println(f"format(graft) median:    $fMs%8.1f ms  (${fMs / nMs}%.2fx)")
    println(s"front-door scan node: $scan")
    // DV'd arm (VERDICT r12 item 1's criterion: within ~1.2x of the
    // clean front door): scattered MoR deletes — the steady state of
    // a table under churn — must keep the columnar scan, now masked
    // in-reader by GraftParquetFileFormat instead of falling back to
    // the V1 row path
    SnapshotTable.deleteMoR(spark, path,
      F.col("l_orderkey") % 997 === 0)
    def frontDv(): Unit =
      spark.read.format("graft").load(path).filter(pred)
        .agg(F.count(F.lit(1)), F.sum(F.col("l_quantity"))).collect()
    frontDv() // warm
    val dMs = median((0 until 5).map(_ => timeMs(frontDv())))
    val dvScan = spark.read.format("graft").load(path).filter(pred)
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Scan") || l.contains("FileScan"))
      .take(2).mkString(" | ").trim
    println(f"format(graft) DV'd median: $dMs%6.1f ms  " +
      f"(${dMs / fMs}%.2fx of clean front door)")
    println(s"DV'd front-door scan node: $dvScan")
    // MEGA-DV arm (VERDICT r13 item 1's criterion): a cumulative
    // deletion vector whose DECODED size crosses the old 64 MB
    // broadcast cliff (>8M positions — the steady state of a 100 TB
    // table under sustained MoR churn) must STILL plan the columnar
    // FileScan within ~1.2x of the clean scan: per-file blobs load
    // executor-side, so no global bound exists anymore. Before r14
    // this arm fell back to the V1 row-materializing relation with a
    // shuffled anti-join.
    val megaPath = new org.apache.hadoop.fs.Path(path).getParent
      .toString + "/mega_snap"
    val n = 40000000L // 25% scattered deletes -> 10M positions (~80 MB)
    SnapshotTable.create(
      spark.range(n).select(F.col("id"), (F.col("id") * 2).as("v"))
        .repartitionByRange(16, F.col("id"))
        .sortWithinPartitions(F.col("id")), megaPath)
    def megaAgg(): Long =
      spark.read.format("graft").load(megaPath)
        .agg(F.sum(F.col("v")), F.count(F.lit(1))).collect()
        .head.getLong(1)
    megaAgg() // warm
    val cleanMs = median((0 until 3).map(_ => timeMs(megaAgg())))
    val tDel = timeMs(SnapshotTable.deleteMoR(spark, megaPath,
      F.col("id") % 4 === 1))
    val gotRows = megaAgg() // warm + correctness
    require(gotRows == n - n / 4,
      s"mega-DV masked count wrong: $gotRows vs ${n - n / 4}")
    val mMs = median((0 until 3).map(_ => timeMs(megaAgg())))
    val megaPlan = spark.read.format("graft").load(megaPath)
      .queryExecution.executedPlan.toString
    val megaScan = megaPlan.linesIterator
      .filter(l => l.contains("Scan") || l.contains("Batched"))
      .take(2).mkString(" | ").trim
    require(megaPlan.contains("FileScan parquet") &&
      !megaPlan.contains("ExistingRDD"),
      s"mega-DV arm fell off the columnar path:\n$megaScan")
    println(f"mega clean scan median:   $cleanMs%8.1f ms  (40M rows)")
    println(f"mega 10M-delete commit:   $tDel%8.1f ms")
    println(f"mega DV'd scan median:    $mMs%8.1f ms  " +
      f"(${mMs / cleanMs}%.2fx of clean; decoded DV ~80 MB > 64 MB cliff)")
    println(s"mega DV'd scan node: $megaScan")
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path).getParent, true)
    spark.stop()
  }
}
