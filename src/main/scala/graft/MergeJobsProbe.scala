package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.SnapshotTable

/** Job-level attribution of the keyed-merge verb's warm constant (the
  * heaviest lakehouse verb per SnapVerbProbe): a SparkListener records
  * every job's callsite and wall time during one warm merge, so the
  * ledger's "at floor" verdict rests on a measured job list instead of
  * a code read (guide §1.1).
  */
object MergeJobsProbe {
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

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(js.jobId, (site, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (site, t0) =>
          done.add((je.jobId, site, je.time - t0))
        }
      }
    })

    val orders = Tables(spark, sfDir, "orders")
    val base = java.nio.file.Files
      .createTempDirectory("merge_jobs_probe").toString
    val dir = s"$base/t"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))

    SnapshotTable.create(orders.limit(50000).repartition(4), dir)
    def upd(n: Int) = orders.limit(n)
      .withColumn("o_orderpriority", lit("9-MERGED"))
    // warm the verb twice, then measure the third
    SnapshotTable.merge(upd(500), dir, Seq("o_orderkey"))
    SnapshotTable.merge(upd(500), dir, Seq("o_orderkey"))
    Thread.sleep(500); done.clear()
    // sample the main thread while the timed merge runs: driver-side
    // gaps between jobs show up as hot graft/spark frames
    val mainThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val st = mainThread.getStackTrace
        val frame = st.find(f =>
            f.getClassName.startsWith("graft.") &&
              !f.getMethodName.contains("main"))
          .orElse(st.find(f =>
            f.getClassName.startsWith("org.apache.spark.sql.catalyst") ||
              f.getClassName.startsWith("org.apache.spark.sql.execution")))
          .orElse(st.headOption)
          .map(f => s"${f.getClassName.split('.').last}.${f.getMethodName}:${f.getLineNumber}")
          .getOrElse("<empty>")
        samples.merge(frame, 1, (a, b) => a + b)
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true); sampler.start()
    val t0 = System.nanoTime()
    SnapshotTable.merge(upd(500), dir, Seq("o_orderkey"))
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    Thread.sleep(500)
    println("hot driver frames (10ms samples):")
    samples.entrySet().stream()
      .sorted((a, b) => b.getValue - a.getValue).limit(20)
      .forEach(e => println(f"  ${e.getValue}%4d  ${e.getKey}"))
    println(f"merge wall: $wall%.3f s; jobs:")
    var sum = 0L
    done.forEach { case (id, site, ms) =>
      sum += ms; println(f"  job $id%3d $ms%6d ms  $site")
    }
    println(f"sum of job times: ${sum / 1000.0}%.3f s (gaps = driver-side work)")
    spark.stop()
  }
}
