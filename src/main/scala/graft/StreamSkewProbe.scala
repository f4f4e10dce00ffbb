package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.Streaming

/** Streaming state-store SKEW probe (not part of the driver contract):
  * the st* queries run on near-uniform fixtures, so state-store skew —
  * every row of a hot key landing on ONE state partition — is the
  * untested scale axis of the streaming surface. This probe times the
  * two stateful shapes under a planted hot key against a uniform
  * control of identical volume:
  *
  *  - session_window sessionization (st6's operator) with one hot USER
  *    holding `hotPct`% of all events — all its rows shuffle to one
  *    state-store partition and gap-merge into that partition's state;
  *  - watermarked tumbling windows (st1's operator) with one hot
  *    event TYPE — the (window, type) key count stays tiny either way,
  *    so this isolates the shuffle-side skew of a hot grouping key.
  *
  * Both datasets have the SAME row count, time span, file layout and
  * micro-batch cadence (maxFilesPerTrigger), so the printed ratio is
  * the cost of skew alone. Expectation worth testing honestly: window
  * state is micro-batch-bounded and sessions hold O(1) per (user,
  * island), so the skew tax should be the single-reducer imbalance
  * (bounded by the hot key's share), NOT a state blowup — a ratio far
  * above 1/(1-hotPct) would mean a state-store pathology.
  *
  * Run: SPARK_GRAFT_SKEW_N=1000000 SPARK_GRAFT_SKEW_PCT=50 \
  *   sbt "runMain graft.StreamSkewProbe"
  */
object StreamSkewProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_SKEW_N", "1000000").toLong
    val hotPct = sys.env.getOrElse("SPARK_GRAFT_SKEW_PCT", "50").toInt
    val runsPer = sys.env.getOrElse("SPARK_GRAFT_SKEW_RUNS", "3").toInt
    val statePartitions = sys.env.getOrElse("SPARK_GRAFT_SKEW_PARTS", "8").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = java.nio.file.Files.createTempDirectory("skewprobe").toString

    /** Deterministic synthetic events over a ~28-hour span. `skewUser`
      * sends hotPct% of rows to user 0; `skewType` sends hotPct% to
      * one event type; the uniform control spreads both. */
    def gen(dir: String, skewUser: Boolean, skewType: Boolean): Unit = {
      val hot = pmod(hash(col("id") * 7919), lit(100)) < hotPct
      val user =
        if (skewUser) when(hot, 0L).otherwise(pmod(hash(col("id") * 31), lit(20000)))
        else pmod(hash(col("id") * 31), lit(20000))
      val etype =
        if (skewType) when(hot, "hot").otherwise(
          concat(lit("t"), pmod(hash(col("id") * 17), lit(5))))
        else concat(lit("t"), pmod(hash(col("id") * 17), lit(6)))
      spark.range(n)
        .select(col("id").as("event_id"),
          timestamp_seconds(lit(1700000000L) + pmod(hash(col("id") * 13), lit(100000)))
            .as("ts"),
          user.cast(LongType).as("user_id"),
          etype.as("event_type"),
          (pmod(hash(col("id") * 41), lit(1000)) / lit(10.0)).as("value"))
        .repartition(16)
        .write.mode("overwrite").parquet(dir)
    }

    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))

    def stream(dir: String): DataFrame = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4").parquet(dir)

    def time(label: String)(mk: => DataFrame): Double = {
      def once(): Long = {
        val out = Streaming.runToMemory(spark, mk, "skewprobe_sink",
          outputMode = "append", statePartitions = Some(statePartitions))
        val c = out.count()
        spark.sql("DROP TABLE IF EXISTS skewprobe_sink")
        c
      }
      once() // untimed warmup (codegen + state-store provider init)
      val samples = (1 to runsPer).map { _ =>
        val t0 = System.nanoTime(); val rows = once()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val med = samples.map(_._1).sorted.apply(samples.size / 2)
      println(f"PROBE $label%-38s $med%8.2f s  rows=${samples.head._2} " +
        f"(median of $runsPer)")
      med
    }

    // --- session_window sessionization: hot USER ---------------------
    gen(s"$base/sess_uniform", skewUser = false, skewType = false)
    gen(s"$base/sess_hotuser", skewUser = true, skewType = false)
    val sU = time(s"st6 sessions uniform      n=$n")(
      Streaming.sessionWindows(stream(s"$base/sess_uniform"),
        gap = "30 minutes", watermark = "1 hour"))
    val sH = time(s"st6 sessions hot-user($hotPct%) n=$n")(
      Streaming.sessionWindows(stream(s"$base/sess_hotuser"),
        gap = "30 minutes", watermark = "1 hour"))
    println(f"PROBE st6 skew ratio = ${sH / sU}%.2f (hot user owns " +
      f"$hotPct%% of $n events; single-reducer bound ≈ " +
      f"${hotPct / 100.0 * statePartitions}%.1f×)")

    // --- tumbling windows: hot event TYPE ----------------------------
    gen(s"$base/win_uniform", skewUser = false, skewType = false)
    gen(s"$base/win_hottype", skewUser = false, skewType = true)
    val wU = time(s"st1 windows uniform       n=$n")(
      Streaming.windowedCounts(stream(s"$base/win_uniform"),
        windowLength = "1 hour", watermark = "2 hours"))
    val wH = time(s"st1 windows hot-type($hotPct%)  n=$n")(
      Streaming.windowedCounts(stream(s"$base/win_hottype"),
        windowLength = "1 hour", watermark = "2 hours"))
    println(f"PROBE st1 skew ratio = ${wH / wU}%.2f (hot type owns " +
      f"$hotPct%% of $n events)")

    spark.stop()
  }
}
