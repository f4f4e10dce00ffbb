package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.ZOrder

class ZOrderSpec extends SparkSpec {

  // two independent dimensions so no single-column sort can localize both
  private def dims(n: Int) = {
    val s = spark
    s.range(n).select(
      col("id"),
      (col("id") % 317).cast("int").as("x"),
      pmod(hash(col("id")), lit(511)).cast("int").as("y"))
  }

  /** mean per-file span of `c`, normalized by the global span. */
  private def meanFileSpan(path: String, c: String): Double = {
    val df = spark.read.parquet(path)
    val global = df.agg((max(col(c)) - min(col(c))).cast("double")).head.getDouble(0)
    val per = df.groupBy(input_file_name())
      .agg(((max(col(c)) - min(col(c))).cast("double") / global).as("span"))
    per.agg(avg(col("span"))).head.getDouble(0)
  }

  test("z-ordered files localize BOTH dimensions; plain sort only one") {
    val n = 100000
    val base = Files.createTempDirectory("zorder").toString
    val zPath = s"$base/z"
    val sortedPath = s"$base/sorted"

    ZOrder.writeZOrdered(dims(n), zPath, Seq("x", "y"), numFiles = 16)

    // the one-dimensional alternative: range-partition + sort on x only
    dims(n).repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.parquet(sortedPath)

    // content is a re-layout, never a rewrite
    assert(spark.read.parquet(zPath).count() === n)
    assert(spark.read.parquet(zPath).agg(sum(col("id"))).head.getLong(0) ===
      dims(n).agg(sum(col("id"))).head.getLong(0))

    val zx = meanFileSpan(zPath, "x")
    val zy = meanFileSpan(zPath, "y")
    val sx = meanFileSpan(sortedPath, "x")
    val sy = meanFileSpan(sortedPath, "y")

    // 16 files over a 2-D z-curve: each file covers ~1/4 of each axis
    assert(zx < 0.6, s"z-order x span $zx")
    assert(zy < 0.6, s"z-order y span $zy")
    // x-sort localizes x tightly but leaves y at (nearly) full span
    assert(sx < 0.2, s"x-sorted x span $sx")
    assert(sy > 0.8, s"x-sorted y span $sy")
    // and the z layout beats the 1-D layout on the neglected dimension
    assert(zy < sy * 0.7, s"zy=$zy vs sy=$sy")
  }

  test("quantile z-order keeps bulk locality under an outlier; min-max collapses") {
    val s = spark
    // x uniform in [0, 10000) plus ONE outlier at 1e12; y uniform
    val df = s.range(50000).select(
      when(col("id") === 0, 1000000000000L).otherwise(col("id") % 10000)
        .as("x"),
      pmod(hash(col("id")), lit(1000)).cast("long").as("y"))
    val base = java.nio.file.Files.createTempDirectory("zskew").toString

    ZOrder.zOrderBy(df, Seq("x", "y"), numFiles = 16)
      .write.parquet(s"$base/minmax")
    ZOrder.zOrderByQuantiles(df, Seq("x", "y"), numFiles = 16)
      .write.parquet(s"$base/quant")

    // per-file x-span over the BULK (outlier excluded from measurement)
    def bulkSpan(path: String): Double = {
      val d = s.read.parquet(path).filter(col("x") < 1000000L)
      d.groupBy(input_file_name())
        .agg(((max(col("x")) - min(col("x"))) / 10000.0).as("span"))
        .agg(avg(col("span"))).head.getDouble(0)
    }
    val mm = bulkSpan(s"$base/minmax")
    val qt = bulkSpan(s"$base/quant")
    // min-max: the outlier stretches the scale so the whole bulk maps
    // to bucket 0 of x — files span (nearly) the full bulk range
    assert(mm > 0.8, s"min-max bulk span $mm")
    // equi-depth buckets ignore the outlier's leverage
    assert(qt < 0.5, s"quantile bulk span $qt")
    // same rows either way
    assert(s.read.parquet(s"$base/quant").count() === 50000)
    assert(s.read.parquet(s"$base/quant").columns.toSeq === Seq("x", "y"))
  }

  test("zOrderBy accepts timestamp dimensions (unix_micros normalization)") {
    val df = spark.range(1000).selectExpr("id",
      "timestamp_micros(id * 1000000) AS ts",
      "CAST(id % 13 AS INT) AS k")
    val out = ZOrder.zOrderBy(df, Seq("ts", "k"), numFiles = 4)
    assert(out.count() === 1000)
    assert(out.columns.toSeq === Seq("id", "ts", "k")) // helper col dropped
  }

  test("Optimize CLI re-lays an existing table in place (zorder + compact)") {
    val s = spark
    val base = Files.createTempDirectory("optcli").toString
    val path = s"$base/t"
    dims(20000).repartition(8).write.parquet(path)

    Optimize.run(s, Array("zorder", path, "4", "x,y"))
    val zed = s.read.parquet(path)
    assert(zed.count() === 20000)
    assert(zed.groupBy(input_file_name()).count().count() === 4)

    val total = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    Optimize.run(s, Array("compact", path, (total + 1).toString, "x"))
    assert(s.read.parquet(path).count() === 20000)
    assert(new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet")) === 1)
  }

  test("zOrderWithin: z-clustering inside hive partitions prunes multiplicatively") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val path = java.nio.file.Files
      .createTempDirectory("zwithin").toString + "/t"
    val rnd = new scala.util.Random(7)
    val cats = Seq("a", "b", "c", "d")
    val rows = (0 until 20000).map { i =>
      (i.toLong, cats(rnd.nextInt(4)), rnd.nextInt(10000).toLong,
        rnd.nextInt(10000).toLong)
    }.toDF("id", "cat", "x", "y")
    SnapshotTable.create(
      graft.sources.ZOrder.zOrderWithin(rows, Seq("cat"),
        Seq("x", "y"), 32),
      path, partitionBy = Seq("cat"))
    // partition prune alone
    val (_, keptP, total) = SnapshotTable.readWherePruned(spark, path,
      col("cat") === "b")
    assert(keptP * 3 < total, s"partition prune: $keptP of $total")
    // composite: partition value AND both z dimensions
    val (df, kept, _) = SnapshotTable.readWherePruned(spark, path,
      col("cat") === "b" && col("x") < 2500L && col("y") < 2500L)
    assert(kept < keptP, s"z prune within partition: $kept vs $keptP")
    val expect = rows.filter(col("cat") === "b" && col("x") < 2500L &&
      col("y") < 2500L).count()
    assert(df.count() === expect)
  }

  test("zValue interleaves bits and maps nulls/degenerate dims to 0") {
    import spark.implicits._
    val df = Seq((0, 0), (65535, 65535), (65535, 0)).toDF("a", "b")
    val z = df.select(ZOrder.zValue(Seq(col("a"), col("b")),
      Seq((0.0, 65535.0), (0.0, 65535.0))).as("z")).collect().map(_.getLong(0))
    assert(z(0) === 0L)
    assert(z(1) === (1L << 32) - 1) // all 32 low bits set
    // a occupies even bit positions: 0b0101...01
    assert(z(2) === java.lang.Long.parseLong("0101" * 8, 2))
    // degenerate bounds: dimension contributes nothing
    val zd = df.select(ZOrder.zValue(Seq(col("a"), col("b")),
      Seq((5.0, 5.0), (0.0, 65535.0))).as("z")).head.getLong(0)
    assert((zd & 0x5555555555555555L) === 0L)
  }
}
