package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.ColumnOps
import graft.operators.{AsOfJoin, TimeOps}

/** Scale probe (not part of the driver contract): generates a multi-
  * million-row synthetic panel and times the engine's design choices
  * against their naive alternatives, validating the 100 TB story's
  * claims at a scale where shuffle structure dominates.
  *
  * Run: SPARK_GRAFT_PROBE_ROWS=10000000 sbt "runMain graft.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROWS", "10000000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // report the file sort order of single-file-per-bucket tables so
      // the bucketed as-of case can elide its sorts (off by default
      // since Spark 3.0)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // synthetic events: ~rows records over 200k entities × 60 months
    val events = spark.range(rows).select(
      (col("id") % 200000).as("entity"),
      add_months(lit("2015-01-01").cast(DateType),
        (pmod(hash(col("id")), lit(60))).cast(IntegerType)).as("mois"),
      (pmod(hash(col("id") + 1), lit(10000)) / lit(100.0)).as("amount"))
      .cache()
    events.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-42s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // 1. panel pipeline: entity-key pre-partitioning (1 shuffle) vs
    //    letting agg+windows each arrange their own exchanges
    def pipelineOn(base: DataFrame): DataFrame = {
      val panel = base
        .groupBy(col("entity"), col("mois"))
        .agg(sum(col("amount")).as("amt"))
      val withFeatures = TimeOps.movingAverage(
        TimeOps.diff(
          TimeOps.lag_(panel, Seq("entity"), "mois", Seq("amt"), 1),
          Seq("entity"), "mois", Seq("amt"), 3),
        Seq("entity"), "mois", Seq("amt"), 11)
      withFeatures
    }
    time("panel+lag+diff+mean, entity-prepartitioned") {
      pipelineOn(events.repartition(col("entity"))).count()
    }
    time("panel+lag+diff+mean, naive") {
      pipelineOn(events).count()
    }

    // 2. as-of join: union-tag single-window vs join-back (outer-join
    //    + window + equi-join, the reference's own 3-shuffle shape)
    val left = events.groupBy(col("entity"), col("mois"))
      .agg(count(lit(1)).as("n"))
      .withColumnRenamed("mois", "d")
    val snaps = events.filter(col("amount") > 99.0)
      .groupBy(col("entity"), col("mois").as("d"))
      .agg(max(col("amount")).as("snap"))
    // consume matched rows (snap IS NOT NULL), not a bare count: column
    // pruning would otherwise delete the window/value computation from
    // the union-tag plan and time only its union+filter skeleton
    time("as-of join, union-tag (1 shuffle)") {
      AsOfJoin.mergeAsOf(left, snaps, "d", Seq("entity"),
        Some(92), "backward").filter(col("snap").isNotNull).count()
    }
    time("as-of join, join-back (reference shape)") {
      AsOfJoin.mergeAsOfJoinBack(left, snaps, "d", Seq("entity"),
        Some(92), "backward").filter(col("snap").isNotNull).count()
    }
    time("as-of join, native exec (merge scan)") {
      AsOfJoin.mergeAsOfNative(left, snaps, "d", Seq("entity"),
        Some(92), "backward").filter(col("snap").isNotNull).count()
    }
    // pre-clustered inputs (stand-in for bucketed tables): the native
    // exec's ClusteredDistribution is already satisfied → ZERO
    // exchanges; union-tag must still union both tables and re-sort
    // the union (union destroys partitioning)
    val leftClustered = left.repartition(col("entity")).localCheckpoint()
    val snapsClustered = snaps.repartition(col("entity")).localCheckpoint()
    time("as-of pre-clustered, union-tag") {
      AsOfJoin.mergeAsOf(leftClustered, snapsClustered, "d", Seq("entity"),
        Some(92), "backward").filter(col("snap").isNotNull).count()
    }
    time("as-of pre-clustered, native (0 exchanges)") {
      AsOfJoin.mergeAsOfNative(leftClustered, snapsClustered, "d",
        Seq("entity"), Some(92), "backward")
        .filter(col("snap").isNotNull).count()
    }
    // TRUE disk-bucketed + SORTED tables (bucketBy + sortBy(entity, d),
    // one file per bucket via the pre-repartition): both the
    // distribution AND the per-partition ordering come from the files,
    // so the native exec should run with zero exchanges and zero sorts;
    // the union-tag window must still union both tables, re-shuffle the
    // union, and sort it (union discards both properties). The plan's
    // exchange/sort counts are printed for the record, honest either
    // way.
    spark.sql("DROP TABLE IF EXISTS probe_asof_left")
    spark.sql("DROP TABLE IF EXISTS probe_asof_snaps")
    graft.sources.IO.writeBucketed(
      left.repartition(32, col("entity")), "probe_asof_left",
      Seq("entity"), 32, Seq("entity", "d"))
    graft.sources.IO.writeBucketed(
      snaps.repartition(32, col("entity")), "probe_asof_snaps",
      Seq("entity"), 32, Seq("entity", "d"))
    val leftB = spark.table("probe_asof_left")
    val snapsB = spark.table("probe_asof_snaps")
    time("as-of BUCKETED+sorted, union-tag") {
      AsOfJoin.mergeAsOf(leftB, snapsB, "d", Seq("entity"),
        Some(92), "backward").filter(col("snap").isNotNull).count()
    }
    time("as-of BUCKETED+sorted, native") {
      AsOfJoin.mergeAsOfNative(leftB, snapsB, "d", Seq("entity"),
        Some(92), "backward").filter(col("snap").isNotNull).count()
    }
    locally {
      val nat = AsOfJoin.mergeAsOfNative(leftB, snapsB, "d",
        Seq("entity"), Some(92), "backward")
      nat.collect()
      val planStr = nat.queryExecution.executedPlan.toString
      val finalSection = planStr.split("== Initial Plan ==")(0)
      val nExch = finalSection.split("\n")
        .count(_.contains("Exchange hashpartitioning"))
      val nSort = finalSection.split("\n").count(_.trim.matches(".*\\bSort \\[.*"))
      println(s"PROBE as-of bucketed native plan: exchanges=$nExch sorts=$nSort")
    }
    spark.sql("DROP TABLE IF EXISTS probe_asof_left")
    spark.sql("DROP TABLE IF EXISTS probe_asof_snaps")

    // SKEW regime, FORWARD direction, VALUES CONSUMED — the regime that
    // genuinely kills the union-tag form. Spark's UnboundedFollowing
    // window frame RECOMPUTES the aggregate for every row by scanning
    // from the current row to the partition end: O(n²) on the hot
    // group. (r4's probe concluded "WindowExec handles both directions
    // near-linearly" — it was unknowingly timing a column-pruned plan:
    // a bare count() deletes the window functions entirely. Consuming
    // the carried value exposes the quadratic.) Two sizes print the
    // empirical exponent; the hot group is kept SMALL because the
    // quadratic really is that bad — extrapolate 0.5M rows at your
    // peril. The native exec's merge scan is O(n) with O(1) state in
    // every direction.
    def skewInputs(hot: Long): (DataFrame, DataFrame) = (
      spark.range(hot).select(lit(0L).as("entity"),
        timestamp_micros(col("id") * 1000000L).as("d")),
      spark.range(math.max(hot / 100, 1)).select(lit(0L).as("entity"),
        timestamp_micros(col("id") * 100000000L).as("d"),
        (col("id") % 100).cast("double").as("snap")))
    val skewTimes = scala.collection.mutable.Map.empty[(String, Long), Double]
    for (hot <- Seq(50000L, 100000L)) {
      val (sl, ss) = skewInputs(hot)
      val t0 = System.nanoTime()
      AsOfJoin.mergeAsOf(sl, ss, "d", Seq("entity"), None, "forward")
        .filter(col("snap").isNotNull).count()
      skewTimes(("union", hot)) = (System.nanoTime() - t0) / 1e9
      println(f"PROBE as-of fwd 1-hot-entity n=$hot%-8d union-tag " +
        f"${skewTimes(("union", hot))}%8.2f s")
      val t1 = System.nanoTime()
      AsOfJoin.mergeAsOfNative(sl, ss, "d", Seq("entity"), None, "forward")
        .filter(col("snap").isNotNull).count()
      skewTimes(("native", hot)) = (System.nanoTime() - t1) / 1e9
      println(f"PROBE as-of fwd 1-hot-entity n=$hot%-8d native    " +
        f"${skewTimes(("native", hot))}%8.2f s")
    }
    for (form <- Seq("union", "native"))
      println(f"PROBE as-of fwd skew exponent, $form = " +
        f"${math.log(skewTimes((form, 100000L)) / skewTimes((form, 50000L))) /
          math.log(2.0)}%.2f (2.0 = quadratic, 1.0 = linear)")

    // 3. interval explosion: sequence+explode vs range-join on a spine
    val intervals = events.limit(2000000)
      .select(col("entity"), col("mois").as("d0"),
        add_months(col("mois"), 6).as("d1"))
      .cache()
    intervals.count()
    time("interval→month, sequence+explode") {
      TimeOps.explodeInterval(intervals, "d0", "d1", "m").count()
    }
    time("interval→month, spine range-join") {
      val spine = TimeOps.dateSpine(spark, "2015-01-01", "2021-01-01",
        colName = "m")
      intervals.join(spine,
        col("m").between(col("d0"), col("d1")), "inner").count()
    }

    // 4. global cumulative sum: the distributed prefix-sum (range
    //    partitions + per-partition windows + broadcast offsets) vs the
    //    naive empty-partitionBy window, which funnels every row
    //    through ONE task — the gap is the whole point of globalCumSum
    val forCum = events.select(col("entity"), col("mois"),
      (col("amount") * 100).cast("long").as("v")).cache()
    forCum.count()
    // consume max(cum), not count(): a count would let the optimizer
    // prune the window/cumsum entirely and time nothing
    time("global cumsum, distributed prefix-sum") {
      operators.Aggregates.globalCumSum(forCum,
          Seq(col("entity").asc, col("mois").asc), col("v"), "cum")
        .agg(max(col("cum"))).first().getLong(0)
    }
    time("global cumsum, single-task global window") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy(col("entity"), col("mois"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      forCum.withColumn("cum", sum(col("v")).over(w))
        .agg(max(col("cum"))).first().getLong(0)
    }

    // 5. funnel: the single-scan fold (ONE pass over the fact table,
    //    one shuffle on the entity key) vs the staged-aggregate
    //    multi-pass (one scan + one shuffle join PER STEP — the r5
    //    shape, kept as the parity reference). The filtered-scan
    //    baseline prices one pass, so (time / baseline) reads directly
    //    as the scan-cost multiplier the verdict asked to bound (~1 for
    //    the fold net of its aggregation, ~N for the multi-pass).
    //    Consumed via stage sums so pruning can't delete the fold.
    val funnelEvents = spark.range(rows).select(
      (col("id") % 200000).as("user_id"),
      element_at(array(lit("view"), lit("click"), lit("purchase"),
          lit("other")),
        (pmod(hash(col("id") * 13), lit(4)) + 1).cast(IntegerType))
        .as("event_type"),
      pmod(hash(col("id") * 17), lit(1000000)).as("ts")).cache()
    funnelEvents.count()
    val funnelSteps = Seq("view", "click", "purchase")
    time("funnel baseline, one filtered scan") {
      funnelEvents.filter(col("event_type").isin(funnelSteps: _*)).count()
    }
    time("funnel 3-step, single-scan fold") {
      operators.Aggregates.funnel(funnelEvents, "user_id", "event_type",
          "ts", funnelSteps)
        .agg(sum(col("stage")).as("s"), count(col("t_2")).as("p"))
        .first().getLong(0)
    }
    time("funnel 3-step, staged multi-pass") {
      operators.Aggregates.funnelMultiPass(funnelEvents, "user_id",
          "event_type", "ts", funnelSteps)
        .agg(sum(col("stage")).as("s"), count(col("t_2")).as("p"))
        .first().getLong(0)
    }

    spark.stop()
  }
}
