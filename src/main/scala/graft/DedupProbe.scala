package graft

import org.apache.spark.sql.SparkSession

/** Scratch perf probe for the dedup path (not part of the driver
  * contract): times d2-style PPJoin stages in isolation and prints the
  * physical plan, so plan-choice instability shows up without the full
  * bench harness around it.
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val sets = graft.operators.Dedup.shingleSets(docs, "doc_id", "text", 3)
    time("shingleSets build+persist") { sets.count() }

    // pair construction is EAGER (scoped persists are released before
    // return), so build + count inside the timer
    for (i <- 1 to 3) {
      val pairs = time(s"ppjoin run $i") {
        val p = graft.operators.Dedup
          .ngramJaccardPairsFromSets(sets, threshold = 0.8)
        p.count()
        p
      }
      if (i == 1) pairs.explain("formatted")
    }
    spark.stop()
  }
}
