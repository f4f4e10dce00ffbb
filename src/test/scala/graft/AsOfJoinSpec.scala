package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.AsOfJoin

/** merge_asof golden fixtures ported verbatim from the reference's
  * tests/test_utils.py:9-129 (tolerance=365, backward/forward; the
  * reference does not implement 'nearest' — neither do we). */
class AsOfJoinSpec extends SparkSpec {

  private def d(s: String): Date = Date.valueOf(s)

  test("property: mergeAsOf equals a naive per-row reference on random panels") {
    import org.scalacheck.{Gen, rng}
    val epoch = d("2020-01-01").toLocalDate
    // random (entity, dayOffset[, value]) tuples over a 30-day window
    val leftRowGen = for {
      e <- Gen.choose(0, 3); day <- Gen.choose(0, 29)
    } yield (e.toLong, day)
    val rightRowGen = for {
      e <- Gen.choose(0, 3); day <- Gen.choose(0, 29)
      v <- Gen.choose(-1000, 1000)
    } yield (e.toLong, day, v.toDouble)

    val leftSchema = StructType(Seq(
      StructField("entity", LongType), StructField("d", DateType)))
    val rightSchema = StructType(Seq(
      StructField("entity", LongType), StructField("d", DateType),
      StructField("v", DoubleType)))

    for (caseIdx <- 0 until 25) {
      val seed = rng.Seed(caseIdx.toLong * 7919 + 1)
      val params = Gen.Parameters.default
      val leftRows = Gen.listOfN(40, leftRowGen).pureApply(params, seed)
        .distinct
      val rightRows = Gen.listOfN(25, rightRowGen)
        .pureApply(params, seed.next)
        .groupBy(r => (r._1, r._2)).values.map(_.head).toList // unique keys
      val direction = if (caseIdx % 2 == 0) "backward" else "forward"
      val tol = if (caseIdx % 3 == 0) Some(7) else None

      val leftDf = spark.createDataFrame(
        spark.sparkContext.parallelize(leftRows.map { case (e, day) =>
          Row(e, Date.valueOf(epoch.plusDays(day))) }, 4), leftSchema)
      val rightDf = spark.createDataFrame(
        spark.sparkContext.parallelize(rightRows.map { case (e, day, v) =>
          Row(e, Date.valueOf(epoch.plusDays(day)), v) }, 4), rightSchema)

      val got = AsOfJoin.mergeAsOf(leftDf, rightDf, "d", Seq("entity"),
          tol, direction)
        .collect()
        .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
          Option(r.get(2)).map(_.asInstanceOf[Double])))
        .toSet

      val expected = leftRows.map { case (e, day) =>
        val cands = rightRows.filter(_._1 == e)
        val m = direction match {
          case "backward" => cands.filter(_._2 <= day)
            .sortBy(_._2).lastOption
          case "forward" => cands.filter(_._2 >= day)
            .sortBy(_._2).headOption
        }
        val v = m match {
          case Some((_, rd, rv)) =>
            val dist = if (direction == "backward") day - rd else rd - day
            if (tol.exists(t => dist > t)) None else Some(rv)
          case None => None
        }
        (e, epoch.plusDays(day).toEpochDay, v)
      }.toSet

      assert(got == expected,
        s"case $caseIdx ($direction, tol=$tol): " +
          s"missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("property: ffill/bfill/interpolate equal naive references on random series") {
    import org.scalacheck.{Gen, rng}
    import graft.operators.TimeOps
    val epoch = d("2020-01-01").toLocalDate
    val rowGen = for {
      e <- Gen.choose(0, 2); day <- Gen.choose(0, 19)
      v <- Gen.option(Gen.choose(-100, 100).map(_.toDouble))
    } yield (e.toLong, day, v)
    val schema = StructType(Seq(
      StructField("entity", LongType), StructField("d", DateType),
      StructField("x", DoubleType, nullable = true)))

    for (caseIdx <- 0 until 15) {
      val seed = rng.Seed(caseIdx.toLong * 104729 + 3)
      // unique (entity, day) so the window order is total
      val rows = Gen.listOfN(30, rowGen)
        .pureApply(Gen.Parameters.default, seed)
        .groupBy(r => (r._1, r._2)).values.map(_.head).toList
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (e, day, v) =>
          Row(e, Date.valueOf(epoch.plusDays(day)),
            v.map(java.lang.Double.valueOf).orNull) }, 3), schema)

      def naive(series: List[(Int, Option[Double])],
          mode: String): Map[Int, Option[Double]] = {
        val sorted = series.sortBy(_._1)
        val known = sorted.collect { case (day, Some(v)) => (day, v) }
        // interpolation is ROW-POSITION-based, like the reference's
        // LinearInterpolationOperator (positions on a dense monthly
        // panel ARE the time steps — transform.py:939-1054)
        val posOf = sorted.zipWithIndex.map { case ((day, _), i) =>
          day -> i
        }.toMap
        val knownPos = sorted.zipWithIndex.collect {
          case ((_, Some(v)), i) => (i, v)
        }
        sorted.map { case (day, v0) =>
          day -> (v0 match {
            case Some(v) => Some(v)
            case None => mode match {
              case "ffill" => known.filter(_._1 < day).lastOption.map(_._2)
              case "bfill" => known.find(_._1 > day).map(_._2)
              case "interp" =>
                val pos = posOf(day)
                val prev = knownPos.filter(_._1 < pos).lastOption
                val next = knownPos.find(_._1 > pos)
                (prev, next) match {
                  case (Some((pp, pv)), Some((np, nv))) =>
                    Some(pv + (nv - pv) * (pos - pp).toDouble / (np - pp))
                  case _ => None
                }
            }
          })
        }.toMap
      }

      val byEntity = rows.groupBy(_._1).map { case (e, rs) =>
        e -> rs.map(r => (r._2, r._3))
      }
      for ((mode, out) <- Seq(
          "ffill" -> TimeOps.ffill(df, Seq("entity"), "d", Seq("x")),
          "bfill" -> TimeOps.bfill(df, Seq("entity"), "d", Seq("x")),
          "interp" -> TimeOps.interpolate(df, Seq("entity"), "d", Seq("x")))) {
        val got = out.collect().map(r =>
          (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay - epoch.toEpochDay,
            Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
        val expected = byEntity.flatMap { case (e, series) =>
          naive(series, mode).map { case (day, v) => (e, day.toLong, v) }
        }.toSet
        assert(got == expected, s"case $caseIdx $mode: " +
          s"missing=${expected -- got} extra=${got -- expected}")
      }
    }
  }

  private lazy val left = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("043339338", d("2018-01-01"), Integer.valueOf(7), "760"),
      Row("043339338", d("2018-02-01"), Integer.valueOf(9), "971"),
      Row("043339338", d("2018-03-01"), Integer.valueOf(83), "880"),
      Row("043339338", d("2018-04-01"), Integer.valueOf(76), "307"),
      Row("043339338", d("2018-05-01"), Integer.valueOf(90), "121"),
      Row("043339338", d("2018-06-01"), Integer.valueOf(64), "540"),
      Row("043339338", d("2018-07-01"), Integer.valueOf(83), "527"),
      Row("043339338", d("2018-08-01"), Integer.valueOf(87), "806"),
      Row("043339338", d("2018-09-01"), Integer.valueOf(68), "979"),
      Row("043339338", d("2018-10-01"), Integer.valueOf(21), "387"),
      Row("293736607", d("2019-12-01"), Integer.valueOf(23), "107"),
      Row("293736607", d("2020-01-01"), Integer.valueOf(97), "107"),
      Row("293736607", d("2020-02-01"), Integer.valueOf(96), "538"),
      Row("293736607", d("2020-03-01"), Integer.valueOf(33), "068"),
      Row("293736607", d("2020-04-01"), null, "315"),
      Row("293736607", d("2020-05-01"), Integer.valueOf(99), "670"),
      Row("293736607", d("2020-06-01"), Integer.valueOf(71), "246"),
      Row("293736607", d("2020-07-01"), Integer.valueOf(19), "919"),
      Row("293736607", d("2020-08-01"), Integer.valueOf(95), "806"),
      Row("293736607", d("2020-09-01"), null, "070"),
      Row("293736607", d("2020-10-01"), Integer.valueOf(38), "782"))),
    StructType(Seq(
      StructField("siren", StringType, nullable = false),
      StructField("période", DateType, nullable = false),
      StructField("ca", IntegerType, nullable = true),
      StructField("category", StringType, nullable = true))))

  private lazy val right = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("043339338", d("2018-01-01"), Integer.valueOf(200)),
      Row("043339338", d("2018-06-01"), Integer.valueOf(40)),
      Row("293736607", d("2019-01-01"), Integer.valueOf(50)),
      Row("293736607", d("2020-02-01"), Integer.valueOf(70)),
      Row("293736607", d("2020-08-01"), Integer.valueOf(30)))),
    StructType(Seq(
      StructField("siren", StringType, nullable = false),
      StructField("période", DateType, nullable = false),
      StructField("ebe", IntegerType, nullable = true))))

  // expected ebe per (siren, période) in left order
  private val expectedBackward: Seq[Integer] = Seq[Integer](
    200, 200, 200, 200, 200, 40, 40, 40, 40, 40,
    50, 50, 70, 70, 70, 70, 70, 70, 30, 30, 30)
  private val expectedForward: Seq[Integer] = Seq[Integer](
    200, 40, 40, 40, 40, 40, null, null, null, null,
    70, 70, 70, 30, 30, 30, 30, 30, 30, null, null)

  private def run(direction: String): Seq[Integer] =
    AsOfJoin.mergeAsOf(left, right, on = "période", by = Seq("siren"),
        toleranceDays = Some(365), direction = direction)
      .orderBy("siren", "période")
      .collect().toSeq.map(_.getAs[Integer]("ebe"))

  test("merge_asof backward with tolerance 365 (test_utils.py:112-119)") {
    assert(run("backward") == expectedBackward)
  }

  test("merge_asof forward with tolerance 365 (test_utils.py:122-129)") {
    assert(run("forward") == expectedForward)
  }

  test("merge_asof 'nearest' raises, matching the reference's gap") {
    intercept[IllegalArgumentException] {
      AsOfJoin.mergeAsOf(left, right, on = "période", by = Seq("siren"),
        direction = "nearest")
    }
  }

  test("merge_asof preserves left rows and columns") {
    val out = AsOfJoin.mergeAsOf(left, right, on = "période",
      by = Seq("siren"), toleranceDays = None, direction = "backward")
    assert(out.count() == left.count())
    assert(out.columns.toSeq == (left.columns.toSeq :+ "ebe"))
  }

  test("native as-of join passes the reference goldens (both directions)") {
    def runNative(direction: String): Seq[Integer] =
      AsOfJoin.mergeAsOfNative(left, right, on = "période",
          by = Seq("siren"), toleranceDays = Some(365),
          direction = direction)
        .orderBy("siren", "période")
        .collect().toSeq.map(_.getAs[Integer]("ebe"))
    assert(runNative("backward") == expectedBackward)
    assert(runNative("forward") == expectedForward)
  }

  test("native as-of join: parity with mergeAsOf on random panels") {
    import org.scalacheck.{Gen, rng}
    val epoch = d("2020-01-01").toLocalDate
    val leftRowGen = for {
      e <- Gen.choose(0, 3); day <- Gen.choose(0, 29)
    } yield (e.toLong, day)
    val rightRowGen = for {
      e <- Gen.choose(0, 3); day <- Gen.choose(0, 29)
      v <- Gen.choose(-1000, 1000)
    } yield (e.toLong, day, v.toDouble)
    val leftSchema = StructType(Seq(
      StructField("entity", LongType), StructField("d", DateType)))
    val rightSchema = StructType(Seq(
      StructField("entity", LongType), StructField("d", DateType),
      StructField("v", DoubleType)))
    for (caseIdx <- 0 until 12) {
      val seed = rng.Seed(caseIdx.toLong * 6007 + 11)
      val params = Gen.Parameters.default
      val leftRows = Gen.listOfN(40, leftRowGen).pureApply(params, seed)
        .distinct
      val rightRows = Gen.listOfN(25, rightRowGen)
        .pureApply(params, seed.next)
        .groupBy(r => (r._1, r._2)).values.map(_.head).toList
      val direction = if (caseIdx % 2 == 0) "backward" else "forward"
      val tol = if (caseIdx % 3 == 0) Some(7) else None
      val leftDf = spark.createDataFrame(
        spark.sparkContext.parallelize(leftRows.map { case (e, day) =>
          Row(e, Date.valueOf(epoch.plusDays(day))) }, 4), leftSchema)
      val rightDf = spark.createDataFrame(
        spark.sparkContext.parallelize(rightRows.map { case (e, day, v) =>
          Row(e, Date.valueOf(epoch.plusDays(day)), v) }, 4), rightSchema)
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toSet
      val window = rows(AsOfJoin.mergeAsOf(leftDf, rightDf, "d",
        Seq("entity"), tol, direction))
      val native = rows(AsOfJoin.mergeAsOfNative(leftDf, rightDf, "d",
        Seq("entity"), tol, direction))
      assert(native == window,
        s"case $caseIdx ($direction, tol=$tol): " +
          s"missing=${window -- native} extra=${native -- window}")
    }
  }

  test("native as-of join: composite by-keys match the window form") {
    val schemaL = StructType(Seq(
      StructField("e", LongType), StructField("g", StringType),
      StructField("d", DateType)))
    val schemaR = StructType(Seq(
      StructField("e", LongType), StructField("g", StringType),
      StructField("d", DateType), StructField("v", DoubleType)))
    val rnd = new scala.util.Random(42)
    val epoch = d("2020-01-01").toLocalDate
    val lRows = (0 until 200).map { _ =>
      Row(rnd.nextInt(4).toLong, "g" + rnd.nextInt(3),
        Date.valueOf(epoch.plusDays(rnd.nextInt(60))))
    }.distinct
    val rRows = (0 until 80).map { _ =>
      (rnd.nextInt(4).toLong, "g" + rnd.nextInt(3), rnd.nextInt(60))
    }.distinct.map { case (e, g, day) =>
      Row(e, g, Date.valueOf(epoch.plusDays(day)), day.toDouble)
    }
    val l = spark.createDataFrame(
      spark.sparkContext.parallelize(lRows, 3), schemaL)
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(rRows, 3), schemaR)
    for (dir <- Seq("backward", "forward")) {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(x => (x.getLong(0), x.getString(1),
          x.getDate(2).toString, Option(x.get(3)))).toSet
      val w = rows(AsOfJoin.mergeAsOf(l, r, "d", Seq("e", "g"),
        Some(14), dir))
      val n = rows(AsOfJoin.mergeAsOfNative(l, r, "d", Seq("e", "g"),
        Some(14), dir))
      assert(n == w, s"direction $dir: missing=${w -- n} extra=${n -- w}")
    }
  }

  test("native as-of join: global (no by-keys) as-of matches the window form") {
    // leftBy empty → AllTuples distribution (single partition both
    // sides); the degenerate-but-legal global as-of
    val schemaL = StructType(Seq(StructField("d", DateType)))
    val schemaR = StructType(Seq(
      StructField("d", DateType), StructField("v", DoubleType)))
    val epoch = d("2020-01-01").toLocalDate
    val l = spark.createDataFrame(spark.sparkContext.parallelize(
      (0 until 50).map(i => Row(Date.valueOf(epoch.plusDays(i)))), 3),
      schemaL)
    val r = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(0, 7, 23, 40).map(i =>
        Row(Date.valueOf(epoch.plusDays(i)), i.toDouble)), 2), schemaR)
    for (dir <- Seq("backward", "forward")) {
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(x => (x.getDate(0).toString, Option(x.get(1)))).toSet
      val w = rows(AsOfJoin.mergeAsOf(l, r, "d", Seq.empty, None, dir))
      val n = rows(AsOfJoin.mergeAsOfNative(l, r, "d", Seq.empty, None, dir))
      assert(n == w, s"direction $dir: missing=${w -- n} extra=${n -- w}")
    }
  }

  test("native as-of join: right null-on rows never match, left null-on gets null") {
    val schemaL = StructType(Seq(
      StructField("e", LongType), StructField("d", DateType)))
    val schemaR = StructType(Seq(
      StructField("e", LongType), StructField("d", DateType),
      StructField("v", DoubleType)))
    val l = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, d("2020-01-10")), Row(1L, null))), schemaL)
    val r = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, null, 99.0), Row(1L, d("2020-01-05"), 5.0))), schemaR)
    val got = AsOfJoin.mergeAsOfNative(l, r, "d", Seq("e"))
      .collect()
      .map(x => (Option(x.get(1)).map(_.toString),
        Option(x.get(2)).map(_.asInstanceOf[Double]))).toSet
    assert(got === Set(
      (Some("2020-01-10"), Some(5.0)), // matches the real right row
      (None, None)))                   // null-on left row: no match
  }

  test("optimizer rule prunes unused right values through the as-of node") {
    // right side has 3 value columns on parquet; the query selects only
    // one — PruneAsOfJoinValues must shrink the node and let physical
    // planning narrow the right scan's ReadSchema
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_asof_prune").toString
    val epoch = d("2020-01-01").toLocalDate
    spark.createDataFrame(
        spark.sparkContext.parallelize((0 until 100).map(i =>
          Row(i.toLong % 5, Date.valueOf(epoch.plusDays(i)),
            i.toDouble, i * 2.0, s"x$i"))),
        StructType(Seq(
          StructField("e", LongType), StructField("d", DateType),
          StructField("v1", DoubleType), StructField("v2", DoubleType),
          StructField("v3", StringType))))
      .write.mode("overwrite").parquet(s"$tmp/right.parquet")
    val l = spark.createDataFrame(spark.sparkContext.parallelize(
      (0 until 60).map(i => Row(i.toLong % 5,
        Date.valueOf(epoch.plusDays(i + 3))))),
      StructType(Seq(
        StructField("e", LongType), StructField("d", DateType))))
    val r = spark.read.parquet(s"$tmp/right.parquet")
    val out = AsOfJoin.mergeAsOfNative(l, r, "d", Seq("e"))
      .select("e", "d", "v2")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    val readSchemas = plan.split("\n").filter(_.contains("ReadSchema"))
    assert(readSchemas.exists(s =>
      s.contains("v2") && !s.contains("v1") && !s.contains("v3")),
      s"right scan not pruned:\n$plan")
    // and the pruned plan still computes the right answer
    val window = AsOfJoin.mergeAsOf(l, r, "d", Seq("e"))
      .select("e", "d", "v2")
    assert(out.collect().map(_.toSeq).toSet ==
      window.collect().map(_.toSeq).toSet)
  }

  test("native as-of participates in whole-stage codegen") {
    // regression gate for the doProduce path: the executed plan must
    // show the exec INSIDE a codegen stage (starred), not interpreted
    val l = spark.range(100).selectExpr("id % 5 as e", "id as t",
      "id * 2 as x")
    val r = spark.range(50).selectExpr("id % 5 as e", "id * 2 as t",
      "id * 3 as v")
    val out = AsOfJoin.mergeAsOfNative(l, r, "t", Seq("e"))
    out.collect()
    val planStr = out.queryExecution.executedPlan.toString
    // the AQE plan string prints the final plan (executed, starred when
    // codegen'd) AND the initial plan (never starred) — gate the final
    val finalSection = planStr.split("== Initial Plan ==")(0)
    val asofLines = finalSection.split("\n").filter(_.contains("AsOfJoin "))
    assert(asofLines.nonEmpty && asofLines.forall(_.contains("*(")),
      s"AsOfJoinExec not codegen'd:\n$planStr")
  }

  test("native as-of interpreted path (codegen off) matches the window form") {
    // pins doExecute's UnsafeRowJoiner output assembly: wide right side
    // with fixed- AND variable-length (string) values, null-producing
    // unmatched lefts, both directions, with tolerance
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val l = spark.range(200).selectExpr("id % 7 as e", "id as t",
        "id * 2 as x")
      val r = spark.range(60).selectExpr("id % 7 as e", "id * 3 as t",
        "id * 5 as v", "concat('s', id) as s", "cast(id as double) as w")
      for (dir <- Seq("backward", "forward")) {
        val native = AsOfJoin.mergeAsOfNative(l, r, "t", Seq("e"),
          direction = dir)
        val window = AsOfJoin.mergeAsOf(l, r, "t", Seq("e"),
          direction = dir)
        val planStr = native.queryExecution.executedPlan.toString
        assert(!planStr.contains("*("), s"expected interpreted plan:\n$planStr")
        assert(native.collect().map(_.toSeq).toSet ===
          window.collect().map(_.toSeq).toSet, s"direction $dir diverged")
        assert(native.filter(native("s").isNull).count() > 0,
          "fixture never exercised the null-right (unmatched) arm")
      }
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("native as-of rejects unsupported on-types loudly") {
    import spark.implicits._
    // the physical merge scan reads `on` as a raw int/long word; any
    // other type must be rejected at construction, tolerance or not
    val l = Seq(("a", "2020-01-01", 1.0)).toDF("e", "d", "x")
    val r = Seq(("a", "2020-01-01", 2.0)).toDF("e", "d", "v")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.mergeAsOfNative(l, r, "d", Seq("e"))
    }
    assert(e.getMessage.contains("on-type"))
  }

  test("prune rule reaches through a Filter between Project and as-of") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_asof_prune_filter").toString
    val epoch = d("2020-01-01").toLocalDate
    spark.createDataFrame(
        spark.sparkContext.parallelize((0 until 100).map(i =>
          Row(i.toLong % 5, Date.valueOf(epoch.plusDays(i)),
            i.toDouble, i * 2.0, s"x$i"))),
        StructType(Seq(
          StructField("e", LongType), StructField("d", DateType),
          StructField("v1", DoubleType), StructField("v2", DoubleType),
          StructField("v3", StringType))))
      .write.mode("overwrite").parquet(s"$tmp/right.parquet")
    val l = spark.createDataFrame(spark.sparkContext.parallelize(
      (0 until 60).map(i => Row(i.toLong % 5,
        Date.valueOf(epoch.plusDays(i + 3))))),
      StructType(Seq(
        StructField("e", LongType), StructField("d", DateType))))
    val r = spark.read.parquet(s"$tmp/right.parquet")
    // filter on a LEFT column: the rule must still shrink the right
    // scan to the one selected value column
    val out = AsOfJoin.mergeAsOfNative(l, r, "d", Seq("e"))
      .filter(col("e") =!= 99L)
      .select("e", "d", "v2")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    val readSchemas = plan.split("\n").filter(_.contains("ReadSchema"))
    assert(readSchemas.exists(s =>
      s.contains("v2") && !s.contains("v1") && !s.contains("v3")),
      s"right scan not pruned through Filter:\n$plan")
    // filter on a RIGHT value column: that column must survive pruning
    val out2 = AsOfJoin.mergeAsOfNative(l, r, "d", Seq("e"))
      .filter(col("v1") > 10.0)
      .select("e", "d", "v2")
    out2.collect()
    val plan2 = out2.queryExecution.executedPlan.toString
    val readSchemas2 = plan2.split("\n").filter(_.contains("ReadSchema"))
    assert(readSchemas2.exists(s =>
      s.contains("v1") && s.contains("v2") && !s.contains("v3")),
      s"predicate column dropped by pruning:\n$plan2")
    // and both pruned plans still compute the right answers
    val w1 = AsOfJoin.mergeAsOf(l, r, "d", Seq("e"))
      .filter(col("e") =!= 99L).select("e", "d", "v2")
    assert(out.collect().map(_.toSeq).toSet ==
      w1.collect().map(_.toSeq).toSet)
    val w2 = AsOfJoin.mergeAsOf(l, r, "d", Seq("e"))
      .filter(col("v1") > 10.0).select("e", "d", "v2")
    assert(out2.collect().map(_.toSeq).toSet ==
      w2.collect().map(_.toSeq).toSet)
  }

  test("native as-of join plans one exchange per side and no window/union") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val out = AsOfJoin.mergeAsOfNative(left, right, "période", Seq("siren"))
    out.collect() // finalize the adaptive plan
    // AQE wrappers (AdaptiveSparkPlanExec, query stages) are leaves —
    // recurse into the plans they wrap
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: QueryStageExec => p +: flatten(q.plan)
      case _ => p +: p.children.flatMap(flatten)
    }
    val plan = out.queryExecution.executedPlan
    val flat = flatten(plan)
    assert(flat.exists(_.isInstanceOf[graft.plans.AsOfJoinExec]),
      s"AsOfJoinExec missing in:\n$plan")
    val exchanges = flat.count(_.isInstanceOf[ShuffleExchangeExec])
    assert(exchanges == 2, s"expected 2 exchanges, got $exchanges:\n$plan")
    assert(!flat.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      s"window survived:\n$plan")
    assert(!flat.exists(_.isInstanceOf[org.apache.spark.sql.execution.UnionExec]),
      s"union survived:\n$plan")
  }

  test("mergeAsOfJoinBack matches mergeAsOf on unique right keys") {
    for (dir <- Seq("backward", "forward")) {
      val a = AsOfJoin.mergeAsOf(left, right, "période", Seq("siren"),
        Some(365), dir).orderBy("siren", "période").collect().map(_.toSeq)
      val b = AsOfJoin.mergeAsOfJoinBack(left, right, "période", Seq("siren"),
        Some(365), dir).orderBy("siren", "période").collect().map(_.toSeq)
      assert(a.toSeq == b.toSeq, s"direction $dir")
    }
  }

  test("mergeAsOfJoinBack duplicates left rows on duplicate right keys " +
      "(reference semantics)") {
    val dupRight = right.union(right.limit(1)) // duplicate first right row
    val out = AsOfJoin.mergeAsOfJoinBack(left, dupRight, "période",
      Seq("siren"), Some(365), "backward")
    // rows matching the duplicated (siren, date) appear twice
    assert(out.count() > left.count())
    // the windowed variant keeps one row per left row
    val single = AsOfJoin.mergeAsOf(left, dupRight, "période",
      Seq("siren"), Some(365), "backward")
    assert(single.count() == left.count())
  }
}
