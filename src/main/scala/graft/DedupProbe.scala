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

    // inlined ppjoin body with per-stage timers (probe-only copy of
    // Dedup.ngramJaccardPairsFromSets)
    import org.apache.spark.sql.types._
    val threshold = 0.8
    for (i <- 1 to 2) {
      println(s"--- staged run $i ---")
      val tokens = sets.select(col("doc_id"), explode(col("shset")).as("s"))
      val freq = tokens.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val ordered = tokens.join(freq, Seq("s"))
        .groupBy(col("doc_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("df"), col("s")))),
          x => x("s")).as("ordered"))
        .withColumn("n", size(col("ordered")))
        .withColumn("prefix_len",
          col("n") - ceil(col("n") * threshold - lit(1e-9)).cast(IntegerType) + 1)
      val prefixes = ordered.select(col("doc_id"), col("n"),
        posexplode(slice(col("ordered"), lit(1), col("prefix_len")))
          .as(Seq("p0", "s")))
        .withColumn("p", col("p0") + 1).drop("p0")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("prefixes build+persist") { prefixes.count() }
      val a = prefixes.as("a"); val b = prefixes.as("b")
      val alpha = ceil((col("a.n") + col("b.n")) * lit(threshold / (1 + threshold))
        - lit(1e-9))
      val overlapBound = lit(1)
        .plus(least(col("a.p") - 1, col("b.p") - 1))
        .plus(least(col("a.n") - col("a.p"), col("b.n") - col("b.p")))
      val candidates = a.join(b,
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id")
            && ceil(greatest(col("a.n"), col("b.n")) * threshold - lit(1e-9))
               <= least(col("a.n"), col("b.n"))
            && overlapBound >= alpha)
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nCand = time("candidates build+persist") { candidates.count() }
      println(s"    candidates = $nCand")
      // token-count verify (current)
      val t0 = System.nanoTime()
      val candDocs = candidates.select(col("i").as("doc_id"))
        .union(candidates.select(col("j").as("doc_id"))).distinct()
      val candTok = tokens.join(candDocs, Seq("doc_id"))
      val overlap = candidates
        .join(candTok.select(col("doc_id").as("i"), col("s")), Seq("i"))
        .join(candTok.select(col("doc_id").as("j"), col("s")), Seq("j", "s"))
        .groupBy(col("i"), col("j"))
        .agg(count(lit(1)).as("c"))
      val sizes = sets.select(col("doc_id"), size(col("shset")).as("nsz"))
      val verified = overlap
        .join(sizes.select(col("doc_id").as("i"), col("nsz").as("ni")), Seq("i"))
        .join(sizes.select(col("doc_id").as("j"), col("nsz").as("nj")), Seq("j"))
        .withColumn("jaccard", col("c").cast(DoubleType) /
          (col("ni") + col("nj") - col("c")))
        .filter(col("jaccard") >= threshold)
      println(f"[probe] verify token-count          ${(System.nanoTime()-t0)/1e9}%8.2f s  rows=" + verified.count())
      // array-intersect verify (candidate alternative)
      val t1 = System.nanoTime()
      val withSets = candidates
        .join(sets.select(col("doc_id").as("i"), col("shset").as("sa")), Seq("i"))
        .join(sets.select(col("doc_id").as("j"), col("shset").as("sb")), Seq("j"))
        .withColumn("c", size(array_intersect(col("sa"), col("sb"))))
        .withColumn("jaccard", col("c").cast(DoubleType) /
          (size(col("sa")) + size(col("sb")) - col("c")))
        .filter(col("jaccard") >= threshold)
        .select(col("i"), col("j"), col("jaccard"))
      println(f"[probe] verify array-intersect      ${(System.nanoTime()-t1)/1e9}%8.2f s  rows=" + withSets.count())
      prefixes.unpersist(false)
      candidates.unpersist(false)
    }
    spark.stop()
  }
}
