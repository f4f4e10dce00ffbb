package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{functions => F, SparkSession}
import org.apache.spark.sql.types._

import graft.sources.SnapshotTable

/** 10M-ENTRY distributed-planning probe (VERDICT r11 item 7). The r11
  * ManifestScaleProbe measured 1M entries on local[4]; the design
  * claim under test here is "planning wall scales with cores, driver
  * heap stays flat in table size" — so this probe forges a
  * 10M-entry segmented manifest (19.5k segment files, the real
  * on-disk format), runs [[SnapshotTable.distributedPrunedEntries]]
  * at local[32], and reports planning wall + retained driver heap
  * for
  *   - a prunable range predicate (driver-side segment refutation
  *     carries almost everything — the common case),
  *   - the full-parse worst case (ref aggregates stripped to `n=`,
  *     every segment survives, all 10M entries parse in tasks),
  *   - an equality point-lookup WITH bloom sidecars joined in the
  *     same job vs WITHOUT sidecars (the with/without arm the
  *     verdict asked for; 2^9-bit blooms keep the synthetic index
  *     ~1 GB on disk — bits don't change the join shape).
  * Segment files and sidecars are forged directly (aggregates
  * precomputed) — commit-path write amplification is
  * ManifestScaleProbe's job; this probe isolates PLANNING. Cleans
  * its ~2.5 GB of /tmp synthetics before exiting. */
object PlanScaleProbe {

  private def heapUsed(): Long = {
    System.gc(); Thread.sleep(200); System.gc(); Thread.sleep(200)
    Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dir = java.nio.file.Files
      .createTempDirectory("plan_probe").toString
    fs.mkdirs(new Path(dir, "_graft_log"))
    val n = args.headOption.map(_.toInt).getOrElse(10000000)
    // which format family to forge+run: "text", "pq", or "both" —
    // each half is ~6-10 min at 10M, so same-rig A/Bs run them as
    // separate invocations
    val formats = if (args.length > 1) args(1) else "both"
    val per = 512
    val nSegs = (n + per - 1) / per
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
    // one shared sparse 2^9-bit bitset pool (64 variants) — per-file
    // DECODE cost is what matters and is not pooled
    val rnd = new java.util.Random(11)
    val pool = Array.fill(64) {
      val bs = new Array[Byte](64)
      (0 until 120).foreach { _ =>
        val p = rnd.nextInt(512); bs(p >> 3) =
          (bs(p >> 3) | (1 << (p & 7))).toByte
      }
      java.util.Base64.getEncoder.withoutPadding.encodeToString(bs)
    }
    def segAgg(lo: Long, hi: Long): String =
      Seq(s"n=${hi - lo + 1}", s"b=${(hi - lo + 1) * 134217728L}",
        "hasdv=0",
        s"id=${lo * 1000}:${hi * 1000 + 999}",
        s"ts=${1700000000L + lo}:${1700000600L + hi}",
        s"bl=f!${f"_graft_log/seg-${(lo / per)}%06d.blooms"}",
        "blcols=uid").mkString(";")
    def forgeBlooms(s: Int, lo: Long, hi: Long): Unit = {
      val bOut = fs.create(
        new Path(dir, f"_graft_log/seg-$s%06d.blooms"), true)
      val bsb = new StringBuilder
      (lo to hi).foreach { i =>
        bsb.append(s"f$i.parquet\tuid=b!512!6!${pool((i % 64).toInt)}\n")
      }
      bOut.write(bsb.toString.getBytes("UTF-8")); bOut.close()
    }
    val refs = if (formats == "pq") Seq.empty[String] else {
      println(s"forging $nSegs segment files ($n entries) + sidecars...")
      val tF = System.nanoTime()
      val rs = (0 until nSegs).map { s =>
        val lo = s.toLong * per
        val hi = math.min(lo + per, n.toLong) - 1
        val rel = f"_graft_log/seg-$s%06d.entries"
        val out = fs.create(new Path(dir, rel), true)
        val sb = new StringBuilder
        (lo to hi).foreach(i => { sb.append(line(i)); sb.append('\n') })
        out.write(sb.toString.getBytes("UTF-8")); out.close()
        forgeBlooms(s, lo, hi)
        s"@seg=$rel\t${segAgg(lo, hi)}"
      }
      println(f"  forged in ${(System.nanoTime() - tF) / 1e9}%.0f s")
      rs
    }
    val rangePred = SnapshotTable.resolvedPredicate(spark, schema,
      F.col("id") >= (n.toLong * 1000 / 2) &&
        F.col("id") < (n.toLong * 1000 / 2 + n.toLong))
    // point lookup CONJOINED with a 1% key range: without the range a
    // bloom-less plan necessarily keeps all 10M entries (that IS why
    // blooms exist) and the probe would measure a deliberate 1.4 GB
    // collect, not planning. The conjunct bounds both arms to the
    // same ~100k surviving entries; the arms then differ ONLY in the
    // sidecar join.
    val uidPred = SnapshotTable.resolvedPredicate(spark, schema,
      F.col("uid") === 123456789L &&
        F.col("id") < (n.toLong / 100L) * 1000L)
    val noBloomRefs = refs.map(_.replaceAll(";bl=f![^;]*;blcols=uid", ""))
    val bare = refs.map(l => l.split("\t")(0) + s"\tn=$per")
    def run(label: String, rs: Seq[String],
        pred: org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      for (phase <- Seq("cold", "warm")) {
        val h0 = heapUsed()
        val t = System.nanoTime()
        val (kept, tot) = SnapshotTable.distributedPrunedEntries(
          spark, dir, rs, pred, None)
        val ms = (System.nanoTime() - t) / 1e6
        val dh = (heapUsed() - h0) / 1e6
        println(f"  $label%-34s $phase%4s: ${ms}%9.1f ms, " +
          f"${kept.size}%8d of $tot%d kept, driver heap +${dh}%7.1f MB")
      }
    if (formats != "pq") {
      println(s"distributed planning, $n entries, local[32], " +
        "TEXT segments:")
      run("0.01% id range (segment-refuted)", refs, rangePred)
      run("full parse (aggregates stripped)", bare, rangePred)
      run("uid point lookup, NO sidecars", noBloomRefs, uidPred)
      run("uid point lookup, sidecar join", refs, uidPred)
    }
    if (formats != "text") {
      // COLUMNAR segments (r14): same 10M entries, same aggregates,
      // the on-disk segment format is parquet — the full-parse arm
      // reads typed stat columns vectorized instead of wholetext lines
      println(s"forging $nSegs COLUMNAR segment files...")
      val tP = System.nanoTime()
      val pool2 = java.util.concurrent.Executors.newFixedThreadPool(16)
      val conf = spark.sparkContext.hadoopConfiguration
      val pqRefs = (0 until nSegs).map { s =>
        pool2.submit(new java.util.concurrent.Callable[String] {
          def call(): String = {
            val lo = s.toLong * per
            val hi = math.min(lo + per, n.toLong) - 1
            val rel = f"_graft_log/seg-$s%06d.entriesp"
            graft.sources.SegmentCodec.write(new Path(dir, rel),
              (lo to hi).map(line), conf)
            if (formats == "pq") forgeBlooms(s, lo, hi)
            s"@seg=$rel\t${segAgg(lo, hi)}"
          }
        })
      }.map(_.get(600, java.util.concurrent.TimeUnit.SECONDS))
      pool2.shutdown()
      println(f"  forged in ${(System.nanoTime() - tP) / 1e9}%.0f s")
      val pqNoBloom =
        pqRefs.map(_.replaceAll(";bl=f![^;]*;blcols=uid", ""))
      val pqBare = pqRefs.map(l => l.split("\t")(0) + s"\tn=$per")
      println(s"distributed planning, $n entries, local[32], " +
        "COLUMNAR segments:")
      run("0.01% id range (segment-refuted)", pqRefs, rangePred)
      run("full parse (aggregates stripped)", pqBare, rangePred)
      run("uid point lookup, NO sidecars", pqNoBloom, uidPred)
      run("uid point lookup, sidecar join", pqRefs, uidPred)
      // metadataTable over the same 10M entries: forge a real
      // manifest list so the ops verb has a measured number at scale
      val m = fs.create(new Path(dir, "_graft_log/v00000000.manifest"),
        true)
      m.write(("#wv=2\n#ts=1700000000000\n" +
        pqRefs.mkString("\n") + "\n#eot=1\n").getBytes("UTF-8"))
      m.close()
      for (phase <- Seq("cold", "warm")) {
        val t = System.nanoTime()
        val md = SnapshotTable.metadataTable(spark, dir)
        val agg = md.agg(F.count(F.lit(1)), F.sum("rows")).head()
        println(f"  metadataTable rows+sum           $phase%4s: " +
          f"${(System.nanoTime() - t) / 1e6}%9.1f ms, " +
          f"files=${agg.getLong(0)}%d")
      }
    }
    fs.delete(new Path(dir), true)
    spark.stop()
  }
}
