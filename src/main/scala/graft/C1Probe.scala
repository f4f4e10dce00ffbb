package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}

/** Scratch probe (not part of the driver contract): stage-level timing
  * of the c1 curation pipeline (gopher filter → exact-Jaccard pairs →
  * connected components → decontamination) with the noop sink, so the
  * optimization round knows which stage dominates (guide §1).
  */
object C1Probe {
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
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[c1] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (round <- 1 to 2) {
      println(s"--- round $round")
      val docs = Tables(spark, sfDir, "documents")
      val quality = time("gopherFilter CONSTRUCT")(
        TextOps.gopherFilter(
          docs.repartition(spark.sparkContext.defaultParallelism), "text")
          .select(col("doc_id"), col("text")))
      time("gopherFilter EXECUTE")(noop(quality))
      val pairs = time("ngramJaccardPairs CONSTRUCT")(
        Dedup.ngramJaccardPairs(quality, "doc_id", "text",
          k = 3, threshold = 0.8))
      time("ngramJaccardPairs EXECUTE")(noop(pairs))
      val reps = time("connectedComponents CONSTRUCT")(
        Dedup.connectedComponents(quality, "doc_id", pairs)
          .filter(col("doc_id") === col("cluster_id"))
          .select(col("doc_id")))
      time("connectedComponents EXECUTE")(noop(reps))
      val kept = quality.join(reps, Seq("doc_id"))
      val out = time("contaminate CONSTRUCT")(
        Dedup.contaminatedAgainst(kept,
            docs.filter(col("doc_id") % 50 === 0), "doc_id", "text", k = 4)
          .filter(!col("is_contaminated"))
          .select(col("doc_id"))
          .orderBy(col("doc_id")))
      time("contaminate EXECUTE")(noop(out))
    }
    spark.stop()
  }
}
