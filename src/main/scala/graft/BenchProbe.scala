package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (not part of the driver contract): replays the Bench
  * harness sequence for a subset of queries, so bench-context timings
  * (shared-pass cold/warm state, cache interactions) reproduce outside
  * the full 61-query run.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("d1_exact_dedup", "d2_ngram_jaccard", "d3_minhash_lsh",
        "d4_simhash", "s2_cosine_neardup", "s3_lsh_topk", "s4_ivf_topk")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Seq("documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    SparkEntry.queries.get("a1_agg_named").foreach(_(spark, sfDir).count())

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
