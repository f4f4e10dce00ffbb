package graft

import org.apache.spark.sql.SparkSession

/** Measure the per-construction cost of `spark.read.parquet` resolution
  * (file listing + footer schema inference) that every query pays on
  * every bench pass — 171 Tables() reads across the surface, ~700
  * resolutions per 4-pass bench run (guide §1: measure first; §6 file
  * listing / metadata costs). Compares against an explicit-schema read
  * (`spark.read.schema(s).parquet(path)`), which skips inference, to
  * bound the available saving before any code change.
  */
object ReadResolveProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 50
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    // warm: JVM + page cache + Spark's internal caches
    tables.foreach(t => Tables(spark, dir, t).count())

    def time(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-42s $s%8.3f s  (${s / reps * 1000}%7.2f ms/op)")
      s
    }

    // inferred-schema construction (what Tables does today)
    time(s"construct x$reps x${tables.size} (inferred)") {
      var i = 0
      while (i < reps) {
        tables.foreach(t => Tables(spark, dir, t))
        i += 1
      }
    }
    // explicit-schema construction (no footer read, no inference)
    val schemas = tables.map(t =>
      t -> spark.read.parquet(s"$dir/$t.parquet").schema).toMap
    time(s"construct x$reps x${tables.size} (explicit)") {
      var i = 0
      while (i < reps) {
        tables.foreach { t =>
          Tables.normalize(t,
            spark.read.schema(schemas(t)).parquet(s"$dir/$t.parquet"))
        }
        i += 1
      }
    }
    // end-to-end effect on a typical cheap query: construct+count
    val q = SparkEntry.queries("a1_agg_named")
    time(s"a1_agg_named construct+count x$reps") {
      var i = 0
      while (i < reps) { q(spark, dir).count(); i += 1 }
    }
    spark.stop()
  }
}
