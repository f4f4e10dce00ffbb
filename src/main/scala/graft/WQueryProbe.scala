package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.sources.{IncrementalView, SnapshotTable}

/** Per-STEP wall breakdown of the three heaviest non-stream lakehouse
  * queries (r18, the VERDICT r17 ask: "SnapVerbProbe-style breakdown
  * per query" for w28/w36/w48): replays each query's exact verb
  * sequence with a timer per step, so the committed floor claim is a
  * table of measured constants instead of a family-level sum. One
  * untimed warm rep, then SPARK_GRAFT_WPROBE_RUNS (default 3) timed
  * reps; per-step medians. Not part of the driver contract. */
object WQueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_WPROBE_RUNS", "3").toInt
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
    val s = spark

    // ---- step-timing harness: per rep, a named list of (step, sec)
    def timed[T](steps: collection.mutable.ArrayBuffer[(String, Double)],
        name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      steps += ((name, (System.nanoTime() - t0) / 1e9))
      r
    }

    def report(query: String,
        reps: Seq[Seq[(String, Double)]]): Unit = {
      println(s"== $query (median of ${reps.size} reps)")
      val names = reps.head.map(_._1)
      var total = 0.0
      for (n <- names) {
        val ts = reps.map(_.collectFirst {
          case (`n`, t) => t }.getOrElse(0.0)).sorted
        val med = ts(ts.size / 2)
        total += med
        println(f"  $n%-34s $med%6.3f s")
      }
      println(f"  ${"TOTAL(steps)"}%-34s $total%6.3f s")
    }

    def reps(f: collection.mutable.ArrayBuffer[(String, Double)]
        => Unit): Seq[Seq[(String, Double)]] = {
      val warm = collection.mutable.ArrayBuffer.empty[(String, Double)]
      f(warm) // untimed warm rep
      (1 to runs).map { _ =>
        System.gc()
        val b = collection.mutable.ArrayBuffer.empty[(String, Double)]
        f(b)
        b.toSeq
      }
    }

    // ---- w28_incremental_minmax (exact replay of the query body)
    report("w28_incremental_minmax", reps { st =>
      val tmp = java.nio.file.Files
        .createTempDirectory("wprobe_w28").toString
      val basePath = tmp + "/orders_base"
      val aggPath = tmp + "/orders_agg"
      val orders = Tables(s, sfDir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"),
        col("o_totalprice").cast(DecimalType(18, 2)).*(100)
          .cast(LongType).as("cents"))
      timed(st, "create base (URGENT slice)") {
        SnapshotTable.create(
          orders.filter(col("o_orderpriority") === "1-URGENT"), basePath)
      }
      timed(st, "create agg view") {
        SnapshotTable.create(
          SnapshotTable.read(s, basePath, Some(0))
            .groupBy(col("o_custkey"))
            .agg(count(lit(1)).as("n"), sum(col("cents")).as("total"),
              min(col("cents")).as("mn"), max(col("cents")).as("mx")),
          aggPath)
      }
      val updates = orders
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderstatus") === "F")
        .withColumn("cents", col("cents") * 2) unionByName
        orders.filter(col("o_orderpriority") === "2-HIGH")
      timed(st, "keyed merge (updates+2-HIGH)") {
        SnapshotTable.merge(updates, basePath, Seq("o_orderkey"))
      }
      timed(st, "CoW delete (max invalidation)") {
        SnapshotTable.delete(s, basePath, col("cents") > 25000000L)
      }
      timed(st, "incremental refresh (CDF+merge)") {
        IncrementalView.refreshCountSumMinMax(s, basePath, aggPath,
          "o_custkey", "cents", fromVersion = 0)
      }
      timed(st, "final read+orderBy+count") {
        SnapshotTable.read(s, aggPath).orderBy(col("o_custkey")).count()
      }
    })

    // ---- w36_pruned_minmax_rescan
    report("w36_pruned_minmax_rescan", reps { st =>
      val tmp = java.nio.file.Files
        .createTempDirectory("wprobe_w36").toString
      val basePath = tmp + "/orders_base"
      val aggPath = tmp + "/orders_agg"
      val orders = Tables(s, sfDir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"),
        col("o_totalprice").cast(DecimalType(18, 2)).*(100)
          .cast(LongType).as("cents"))
      def slice(p: String) =
        orders.filter(col("o_orderpriority") === p)
      timed(st, "create base (clustered, 12 files)") {
        SnapshotTable.create(
          slice("1-URGENT").repartitionByRange(12, col("o_custkey"))
            .sortWithinPartitions(col("o_custkey")), basePath)
      }
      timed(st, "create agg view") {
        SnapshotTable.create(
          SnapshotTable.read(s, basePath, Some(0))
            .groupBy(col("o_custkey"))
            .agg(count(lit(1)).as("n"), sum(col("cents")).as("total"),
              min(col("cents")).as("mn"), max(col("cents")).as("mx")),
          aggPath)
      }
      timed(st, "append (2-HIGH)") {
        SnapshotTable.append(slice("2-HIGH"), basePath)
      }
      val m = timed(st, "driver max(custkey)") {
        slice("1-URGENT").agg(max(col("o_custkey"))).head().getLong(0)
      }
      timed(st, "CoW delete (localized)") {
        SnapshotTable.delete(s, basePath,
          col("cents") > 20000000L && col("o_custkey") <= m / 5)
      }
      timed(st, "pruned incremental refresh") {
        IncrementalView.refreshCountSumMinMaxPruned(
          s, basePath, aggPath, "o_custkey", "cents", fromVersion = 0)
      }
      timed(st, "final read+orderBy+count") {
        SnapshotTable.read(s, aggPath).orderBy(col("o_custkey")).count()
      }
    })

    // ---- w48_sql_maintenance
    report("w48_sql_maintenance", reps { st =>
      val path = java.nio.file.Files
        .createTempDirectory("wprobe_w48").toString + "/orders_mt"
      val orders = Tables(s, sfDir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      timed(st, "create (8 small files)") {
        SnapshotTable.create(
          orders.filter(col("o_orderkey") % 3 === 0).repartition(8),
          path)
      }
      val tbl = "wprobe_w48_" + java.util.UUID.randomUUID()
        .toString.replace("-", "").take(8)
      s.sql(s"CREATE TABLE $tbl USING graft OPTIONS (path '$path')")
      orders.filter(col("o_orderkey") % 3 === 1)
        .createOrReplaceTempView("wprobe_w48_src")
      try {
        timed(st, "SQL INSERT") {
          s.sql(s"INSERT INTO $tbl SELECT * FROM wprobe_w48_src")
        }
        timed(st, "SQL UPDATE (MoR)") {
          s.sql(s"UPDATE $tbl SET o_totalprice = o_totalprice + " +
            "100000.0 WHERE o_custkey % 10 < 3")
        }
        timed(st, "SQL DELETE") {
          s.sql(s"DELETE FROM $tbl WHERE o_orderkey % 10 = 7")
        }
        timed(st, "OPTIMIZE (bin-pack)") {
          s.sql(s"OPTIMIZE $tbl").collect()
        }
        timed(st, "OPTIMIZE (no-op)") {
          s.sql(s"OPTIMIZE $tbl").collect()
        }
        timed(st, "OPTIMIZE ZORDER") {
          s.sql(s"OPTIMIZE $tbl ZORDER BY (o_custkey)").collect()
        }
        timed(st, "DESCRIBE HISTORY") {
          s.sql(s"DESCRIBE HISTORY $tbl").collect()
        }
        timed(st, "VACUUM DRY RUN") {
          s.sql(s"VACUUM $tbl RETAIN 2 VERSIONS DRY RUN").collect()
        }
        timed(st, "RESTORE to v2") {
          s.sql(s"RESTORE TABLE $tbl TO VERSION AS OF 2").collect()
        }
        timed(st, "final read+agg+count") {
          s.table(tbl)
            .groupBy((col("o_custkey") % 7).as("grp"))
            .agg(count(lit(1)).as("n"),
              sum(col("o_totalprice").cast(DecimalType(18, 2)))
                .cast(org.apache.spark.sql.types.DoubleType)
                .as("price_total"),
              sum(col("o_orderkey")).as("key_total"))
            .orderBy(col("grp")).count()
        }
      } finally {
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        s.catalog.dropTempView("wprobe_w48_src")
      }
    })

    spark.stop()
  }
}
