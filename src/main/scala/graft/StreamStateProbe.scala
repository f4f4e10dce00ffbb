package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Streaming

/** Streaming STATE-STORE BACKEND probe (not part of the driver
  * contract): the st* surface runs on the default in-memory
  * HDFSBackedStateStoreProvider, whose state must fit in executor
  * memory and whose per-batch maintenance (snapshot + delta files)
  * grows with state size. Spark ships a RocksDB-backed provider
  * (spark.sql.streaming.stateStore.providerClass) that spills state to
  * local disk with changelog checkpointing — the documented choice for
  * large-state production streams. This probe measures the actual
  * crossover on this rig at sf1/sf10 event volumes (1M / 10M rows —
  * the driver's events table is 100k rows at sf0.1 and GenScale
  * multiplies linearly).
  *
  * Two stateful shapes, both from the graded surface:
  *  - st6's session_window sessionization (state = open sessions per
  *    user; needs the provider's prefix-scan path);
  *  - st1's watermarked tumbling windows (state = (window, type) rows
  *    — tiny, isolates the provider's fixed per-batch overhead).
  *
  * The stream is fed file-by-file (maxFilesPerTrigger) so each run
  * pays the same number of micro-batches — per-batch store
  * load/commit overhead is exactly what differs between providers.
  *
  * Run: SPARK_GRAFT_STATE_N=1000000 sbt "runMain graft.StreamStateProbe"
  * Results for this rig are recorded in NOTES_ROUND.md.
  */
object StreamStateProbe {

  private val Providers = Seq(
    "hdfs" -> ("org.apache.spark.sql.execution.streaming.state." +
      "HDFSBackedStateStoreProvider"),
    "rocksdb" -> ("org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"))

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_STATE_N", "1000000").toLong
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_STATE_RUNS", "3").toInt
    val nFiles = 32
    val filesPerTrigger =
      sys.env.getOrElse("SPARK_GRAFT_STATE_FPT", "4").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic events over a ~28-hour span; user cardinality
    // scales with volume like the harness generator's (100k rows /
    // 30k users at sf0.1)
    val users = math.max(1000L, n * 3 / 10)
    val dir = java.nio.file.Files.createTempDirectory("stateprobe").toString +
      "/events"
    spark.range(n)
      .select(
        col("id").as("event_id"),
        timestamp_micros(lit(1700000000000000L) +
          pmod(hash(col("id") * 2654435761L), lit(100000L)) * 1000000L
          + pmod(hash(col("id") * 97L), lit(1000000L))).as("ts"),
        pmod(hash(col("id") * 31L), lit(users)).as("user_id"),
        concat(lit("t"), pmod(hash(col("id") * 17L), lit(6))).as("event_type"),
        (pmod(hash(col("id") * 13L), lit(10000L)) / lit(100.0)).as("value"))
      .repartition(nFiles)
      .write.parquet(dir)
    val schema = spark.read.parquet(dir).schema

    def stream(): DataFrame = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(dir)

    var counter = 0
    def timeRun(shape: String): Double = {
      counter += 1
      val agg = shape match {
        case "st6_sessions" =>
          Streaming.sessionWindows(stream(), gap = "30 minutes",
            watermark = "0 seconds")
        case "st1_windows" =>
          Streaming.windowedCounts(stream(), windowLength = "1 hour",
            watermark = "2 hours")
      }
      val t0 = System.nanoTime()
      val out = Streaming.runToMemory(spark, agg, s"stateprobe_$counter",
        outputMode = if (shape == "st6_sessions") "append" else "complete",
        statePartitions = Some(8))
      val rows = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      require(rows > 0, s"$shape returned no rows")
      sec
    }

    val results = for {
      shape <- Seq("st1_windows", "st6_sessions")
      (pname, pclass) <- Providers
    } yield {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", pclass)
      timeRun(shape) // warmup, discarded
      val secs = (1 to runsPer).map(_ => timeRun(shape))
      val best = secs.min
      println(f"""{"shape":"$shape","provider":"$pname","n":$n,""" +
        f""""best_sec":$best%.2f,"runs":[${secs.map(s => f"$s%.2f").mkString(",")}]}""")
      (shape, pname, best)
    }
    results.groupBy(_._1).foreach { case (shape, rs) =>
      val m = rs.map(r => r._2 -> r._3).toMap
      println(f"$shape: rocksdb/hdfs ratio = ${m("rocksdb") / m("hdfs")}%.2f")
    }
    spark.stop()
  }
}
