package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.JavaConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming-family WALL-CLOCK SLICE probe (r18, the VERDICT r17 ask):
  * split each st-query's bench seconds into mechanically-attributed
  * slices instead of the r6-era "micro-batch machinery floor" claim.
  *
  * Slices, from the engine's own instrumentation
  * (StreamingQueryListener progress events):
  *
  *  - `setup`    = query wall − Σ stream-active wall: everything that
  *    happens OUTSIDE any stream — building source tables, HNSW index
  *    builds, snapshot creates/merges, the final graded read.
  *  - `startstop`= Σ stream-active wall − Σ triggerExecution: stream
  *    lifecycle (query start/teardown, offset-log bootstrap,
  *    processAllAvailable polling gaps between triggers).
  *  - `addBatch` = the per-trigger data work (source slice read +
  *    sink/foreachBatch body, including snapshot commits).
  *  - `walCommit+offsets` = checkpoint WAL + commit-marker fs writes.
  *  - `plan+getBatch` = per-trigger planning + offset/source resolution.
  *  - `stateCommit` = state-store update+removal+commit time summed
  *    over stateful operators (subset of addBatch).
  *
  * Run: SPARK_GRAFT_SLICE_ONLY=st15_stream_source,... \
  *      sbt "runMain graft.StreamSliceProbe"
  * Defaults to the whole st family. One untimed warm pass per query,
  * then `SPARK_GRAFT_SLICE_RUNS` (default 2) timed runs; medians.
  * Not part of the driver contract.
  */
object StreamSliceProbe {

  private class Acc extends StreamingQueryListener {
    case class Prog(durations: Map[String, Long],
      stateCommitMs: Long, batchId: Long)
    val progs = new ConcurrentLinkedQueue[Prog]()
    val started = new ConcurrentLinkedQueue[(java.util.UUID, Long)]()
    val ended = new ConcurrentLinkedQueue[(java.util.UUID, Long)]()
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit =
      started.add((e.runId, System.nanoTime()))
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val d = e.progress.durationMs.asScala.map {
        case (k, v) => k -> v.longValue() }.toMap
      val st = e.progress.stateOperators.map(s =>
        s.allUpdatesTimeMs + s.allRemovalsTimeMs + s.commitTimeMs).sum
      progs.add(Prog(d, st, e.progress.batchId))
    }
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      ended.add((e.runId, System.nanoTime()))
    def reset(): Unit = { progs.clear(); started.clear(); ended.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_SLICE_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new Acc
    spark.streams.addListener(acc)

    val only = sys.env.get("SPARK_GRAFT_SLICE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
      .getOrElse(SparkEntry.queries.keySet.filter(_.startsWith("st")))
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.contains(n) }

    println(f"${"query"}%-26s ${"wall"}%7s ${"setup"}%7s " +
      f"${"strtstp"}%7s ${"addBatch"}%8s ${"wal+off"}%7s " +
      f"${"plan+get"}%8s ${"stCommit"}%8s ${"batches"}%7s")
    for ((name, fn) <- named) {
      try {
        fn(spark, sfDir).count() // warm (plans, codegen, page cache)
        val samples = (1 to runs).map { _ =>
          System.gc()
          acc.reset()
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val wall = (System.nanoTime() - t0) / 1e9
          // listener events are async: drain until the terminated
          // count stops moving (bounded wait)
          var stable = 0
          var last = -1
          while (stable < 3) {
            Thread.sleep(100)
            val n = acc.ended.size + acc.progs.size
            if (n == last) stable += 1 else { stable = 0; last = n }
          }
          val startByRun = acc.started.asScala.toMap
          val activeNs = acc.ended.asScala.toSeq.flatMap {
            case (runId, tEnd) =>
              startByRun.get(runId).map(tEnd - _)
          }.sum
          val ds = acc.progs.asScala.toSeq
          def sumOf(k: String): Double =
            ds.flatMap(_.durations.get(k)).sum / 1e3
          val trigger = sumOf("triggerExecution")
          val addBatch = sumOf("addBatch")
          val wal = sumOf("walCommit") + sumOf("commitOffsets")
          val plan = sumOf("queryPlanning") + sumOf("getBatch") +
            sumOf("latestOffset") + sumOf("triggerPreparation")
          val stCommit = ds.map(_.stateCommitMs).sum / 1e3
          val active = activeNs / 1e9
          (wall, math.max(0.0, wall - active),
            math.max(0.0, active - trigger), addBatch, wal, plan,
            stCommit, ds.size)
        }
        val med = samples.sortBy(_._1).apply(samples.size / 2)
        println(f"$name%-26s ${med._1}%7.2f ${med._2}%7.2f " +
          f"${med._3}%7.2f ${med._4}%8.2f ${med._5}%7.2f " +
          f"${med._6}%8.2f ${med._7}%8.2f ${med._8}%7d")
      } catch { case e: Throwable =>
        println(s"$name FAILED ${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("").take(160))
      }
    }
    spark.streams.removeListener(acc)
    spark.stop()
  }
}
