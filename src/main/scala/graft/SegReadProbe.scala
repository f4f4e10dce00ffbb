package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{functions => F, SparkSession}
import org.apache.spark.sql.types._

import graft.sources.{SegmentCodec, SnapshotTable}

/** SCRATCH probe: where does the 10M-entry full-parse planning time
  * actually go? Forges text + parquet segments ONCE into a persistent
  * dir, then times alternative distributed read shapes:
  *   A wholetext file-source + parse (the shipped text path)
  *   B parallelize(paths) + direct java.nio text read + parse
  *   C spark.read.parquet typed columns (the shipped columnar path)
  *   D parallelize(paths) + ParquetReader Group read (projected)
  * Each arm runs the same compiled predicate and collects kept lines.
  */
object SegReadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val n = args.headOption.map(_.toInt).getOrElse(2000000)
    // entries per segment: 512 is the shipped default granularity;
    // 51200 is the codec's claimed win case (100x coarser segments →
    // parquet's footer/reader-init overhead amortizes) — r15 measures
    // that claim instead of shipping it as a hypothesis
    val per = args.lift(1).map(_.toInt).getOrElse(512)
    val nSegs = (n + per - 1) / per
    val dir = s"/tmp/segread_probe_${n}_$per"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", LongType),
      StructField("tag", StringType), StructField("uid", LongType),
      StructField("part", StringType)))
    def line(i: Long): String =
      s"files/part=p${i % 5}/f$i.parquet\t" + Seq(
        s"id=${i * 1000}:${i * 1000 + 999}",
        s"ts=${1700000000L + i}:${1700000600L + i}",
        s"tag=s!doc${i}aa!doc${i}zz",
        s"len=f!134217728!1700000000000").mkString(";")
    val d = new java.io.File(dir)
    if (!d.exists()) {
      println(s"forging $nSegs segments x2 formats into $dir ...")
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(dir, "_graft_log"))
      val conf = spark.sparkContext.hadoopConfiguration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
      val t0 = System.nanoTime()
      (0 until nSegs).map { s =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val lo = s.toLong * per
            val hi = math.min(lo + per, n.toLong) - 1
            val sb = new StringBuilder
            (lo to hi).foreach(i => { sb.append(line(i)); sb.append('\n') })
            java.nio.file.Files.write(
              java.nio.file.Paths.get(dir, "_graft_log",
                f"seg-$s%06d.entries"),
              sb.toString.getBytes("UTF-8"))
            SegmentCodec.write(
              new Path(dir, f"_graft_log/seg-$s%06d.entriesp"),
              (lo to hi).map(line), conf)
          }
        })
      }.foreach(_.get())
      pool.shutdown()
      println(f"  forged in ${(System.nanoTime() - t0) / 1e9}%.0f s")
    }
    val txtPaths = (0 until nSegs)
      .map(s => f"$dir/_graft_log/seg-$s%06d.entries")
    val pqPaths = (0 until nSegs)
      .map(s => f"$dir/_graft_log/seg-$s%06d.entriesp")
    val du = txtPaths.map(p => new java.io.File(p).length()).sum
    val dup = pqPaths.map(p => new java.io.File(p).length()).sum
    println(f"text bytes: ${du / 1e6}%.0f MB, parquet bytes: ${dup / 1e6}%.0f MB")
    val pred = SnapshotTable.resolvedPredicate(spark, schema,
      F.col("id") >= (n.toLong * 1000 / 2) &&
        F.col("id") < (n.toLong * 1000 / 2 + n.toLong))
    val cp = SnapshotTable.compilePred(pred)

    def time(label: String)(body: => Int): Unit =
      for (phase <- Seq("cold", "warm", "warm2")) {
        val t = System.nanoTime()
        val kept = body
        println(f"  $label%-44s $phase%5s: " +
          f"${(System.nanoTime() - t) / 1e6}%9.1f ms, kept $kept%d")
      }

    val cpSer = cp
    time("A wholetext file-source + parse") {
      import org.apache.spark.sql.Encoders
      spark.read.option("wholetext", "true").text(txtPaths: _*)
        .select(F.col("value")).as[String](Encoders.STRING)
        .mapPartitions(_.flatMap(_.split("\n").iterator
          .map(_.trim).filter(_.nonEmpty).filter { l =>
            val (num, str, bl, nu) = SnapshotTable.parseEntryStats(l)
            cpSer.evalN(SnapshotTable.entryPartitionValues(
              SnapshotTable.entryPath(l)), num, str, bl, nu)
          }))(Encoders.STRING)
        .collect().length
    }
    time("B parallelize + nio text read + parse") {
      spark.sparkContext.parallelize(txtPaths, 64)
        .mapPartitions(_.flatMap { p =>
          val bytes = java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(p))
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
            .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
            .filter { l =>
              val (num, str, bl, nu) = SnapshotTable.parseEntryStats(l)
              cpSer.evalN(SnapshotTable.entryPartitionValues(
                SnapshotTable.entryPath(l)), num, str, bl, nu)
            }
        })
        .collect().length
    }
    time("C spark.read.parquet typed columns") {
      import org.apache.spark.sql.Encoders
      spark.read.schema(SegmentCodec.planProjection).parquet(pqPaths: _*)
        .mapPartitions(_.flatMap { r =>
          val pr = SegmentCodec.planRow(r)
          if (cpSer.evalN(SnapshotTable.entryPartitionValues(pr.rel),
              pr.num, pr.str, Map.empty, pr.nulls))
            Iterator.single(pr.minimalLine)
          else Iterator.empty
        })(Encoders.STRING)
        .collect().length
    }
    time("D parallelize + ParquetReader line col + parse") {
      val conf = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      spark.sparkContext.parallelize(pqPaths, 64)
        .mapPartitions(_.flatMap { p =>
          SegmentCodec.readLines(new Path(p), conf.value).iterator
            .filter { l =>
              val (num, str, bl, nu) = SnapshotTable.parseEntryStats(l)
              cpSer.evalN(SnapshotTable.entryPartitionValues(
                SnapshotTable.entryPath(l)), num, str, bl, nu)
            }
        })
        .collect().length
    }
    spark.stop()
  }
}
