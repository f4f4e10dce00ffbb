package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale-factor multiplier for the harness testdata (not part of the
  * driver contract): writes a `factor`× copy of an sf directory for
  * direct scale-up benching — the evidence behind "survives 10×/100×"
  * instead of exponent extrapolation.
  *
  * Each table is replicated `factor` times; copy 0 is row-identical to
  * the source and every copy k remaps ALL entity keys (primary and
  * foreign) by k·10⁸, so per-copy referential integrity is exact and
  * key-joined results scale exactly ×factor. The tiny nation/region
  * dimensions are shared (unscaled), like real reference data.
  *
  * Content perturbation keeps the data honest for similarity ops:
  *  - documents: every token in copy k > 0 gets a copy suffix
  *    (`w → w_ck`), preserving within-copy shingle relationships
  *    BIT-EXACTLY (suffixed shingles match iff the originals did)
  *    while guaranteeing zero cross-copy shingle overlap — dedup
  *    outputs scale ×factor instead of exploding in C(factor,2)
  *    cross-copy identical pairs;
  *  - embeddings: copy k > 0 adds a hash-derived per-element offset in
  *    [-0.5, 0.5), decorrelating copies so ANN top-k work scales with
  *    the corpus instead of returning degenerate identical twins.
  *
  * Time columns are left unchanged: volume grows ×factor inside the
  * same span, so time-bucketed group counts stay constant while group
  * payloads grow — the realistic shape of MORE DATA, not more history.
  *
  * Run: sbt "runMain graft.GenScale 10 /root/repo/testdata_sf1 /root/testdata/sf0.1"
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val factor = if (args.length > 0) args(0).toInt else 10
    val outDir = if (args.length > 1) args(1) else "/root/repo/testdata_sf1"
    val srcDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val Off = 100000000L // key offset per copy; keys stay < 2^53

    def copies(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(factor).select(col("id").cast(IntegerType).as("__k")))

    def remap(c: String): Column = col(c) + col("__k").cast(LongType) * Off

    def scale(table: String, keys: Seq[String], nFiles: Int,
        extra: DataFrame => DataFrame = identity): Unit = {
      val src = spark.read.parquet(s"$srcDir/$table.parquet")
      val out = extra(copies(src))
      val remapped = keys.foldLeft(out)((d, k) => d.withColumn(k, remap(k)))
        .drop("__k")
      remapped.repartition(nFiles)
        .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
      println(s"GENSCALE $table x$factor -> $outDir/$table.parquet")
    }

    // shared dimensions: straight copy
    for (t <- Seq("region", "nation")) {
      spark.read.parquet(s"$srcDir/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"GENSCALE $t x1 (shared dimension)")
    }

    scale("customer", Seq("c_custkey"), 4)
    scale("supplier", Seq("s_suppkey"), 2)
    scale("part", Seq("p_partkey"), 4)
    scale("orders", Seq("o_orderkey", "o_custkey"), 8)
    scale("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"), 16)
    scale("events", Seq("event_id", "user_id"), 8)

    scale("documents", Seq("doc_id"), 8, df =>
      df.withColumn("text",
        when(col("__k") === 0, col("text")).otherwise(
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_c"), col("__k"))))))

    scale("embeddings", Seq("vec_id"), 8, df =>
      df.withColumn("embedding",
        when(col("__k") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, i) =>
            (x + (pmod(hash(col("vec_id") * 131 + i * 7 + col("__k") * 9973),
              lit(1000)) / lit(1000.0) - lit(0.5)).cast(FloatType))
              .cast(FloatType)))))

    spark.stop()
  }
}
