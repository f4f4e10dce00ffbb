package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.ml._

/** Golden-column fixtures ported verbatim from the reference's
  * tests/test_transform.py (expected outputs live beside inputs — they
  * encode the reference's exact operator semantics). */
class TransformSpec extends SparkSpec {

  private def d(s: String): Date = Date.valueOf(s)

  test("IdentifierNormalizer pads sirens to 9 digits (test_transform.py:17-29)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(524893758, "524893758"),
        Row(45378, "000045378"),
        Row(54489542, "054489542"))),
      StructType(Seq(
        StructField("siren", IntegerType, nullable = false),
        StructField("padded_siren", StringType, nullable = false))))
    val out = new IdentifierNormalizer("siren", 9).transform(df).collect()
    assert(out.forall(r => r.getString(0) == r.getString(1)))
  }

  test("DateParser parses yyyyMMdd (test_transform.py:32-51)") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("20171130", d("2017-11-30")),
        Row("20171229", d("2017-12-29")),
        Row("20171229", d("2017-12-29")),
        Row("20171031", d("2017-10-31")))),
      StructType(Seq(
        StructField("raw_date", StringType, nullable = false),
        StructField("ref_date", DateType, nullable = false))))
    val out = new DateParser("raw_date", "parsed_date", "yyyyMMdd")
      .transform(df).collect()
    assert(out.forall(r => r.getAs[Date]("parsed_date") == r.getAs[Date]("ref_date")))
  }

  private lazy val lagFixture = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("043339338", d("2018-01-01"), Integer.valueOf(7), null),
      Row("043339338", d("2018-02-01"), Integer.valueOf(9), Integer.valueOf(7)),
      Row("043339338", d("2018-03-01"), Integer.valueOf(83), Integer.valueOf(9)),
      Row("043339338", d("2018-04-01"), Integer.valueOf(76), Integer.valueOf(83)),
      Row("043339338", d("2018-05-01"), Integer.valueOf(90), Integer.valueOf(76)),
      Row("043339338", d("2018-06-01"), Integer.valueOf(64), Integer.valueOf(90)),
      Row("043339338", d("2018-07-01"), Integer.valueOf(83), Integer.valueOf(64)),
      Row("043339338", d("2018-08-01"), Integer.valueOf(87), Integer.valueOf(83)),
      Row("043339338", d("2018-09-01"), Integer.valueOf(68), Integer.valueOf(87)),
      Row("043339338", d("2018-10-01"), Integer.valueOf(21), Integer.valueOf(68)),
      Row("293736607", d("2020-01-01"), Integer.valueOf(97), null),
      Row("293736607", d("2020-02-01"), Integer.valueOf(96), Integer.valueOf(97)),
      Row("293736607", d("2020-03-01"), Integer.valueOf(33), Integer.valueOf(96)),
      Row("293736607", d("2020-04-01"), null, Integer.valueOf(33)),
      Row("293736607", d("2020-05-01"), Integer.valueOf(99), null),
      Row("293736607", d("2020-06-01"), Integer.valueOf(71), Integer.valueOf(99)),
      Row("293736607", d("2020-07-01"), Integer.valueOf(19), Integer.valueOf(71)),
      Row("293736607", d("2020-08-01"), Integer.valueOf(95), Integer.valueOf(19)),
      Row("293736607", d("2020-09-01"), null, Integer.valueOf(95)),
      Row("293736607", d("2020-10-01"), Integer.valueOf(38), null))),
    StructType(Seq(
      StructField("siren", StringType, nullable = false),
      StructField("période", DateType, nullable = false),
      StructField("ca", IntegerType, nullable = true),
      StructField("expected_ca_lag1m", IntegerType, nullable = true))))

  test("LagOperator 1m lag, nulls propagate (test_transform.py:62-98)") {
    val out = new LagOperator("ca", 1).transform(lagFixture).collect()
    assert(out.forall(r =>
      r.getAs[Integer]("ca_lag1m") == r.getAs[Integer]("expected_ca_lag1m")))
  }

  private lazy val mvhFixture = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row("219385581", d("2015-01-01"), null, 0.0d, 39.0d, 35.0d, null),
      Row("219385581", d("2017-03-01"), null, 0.0d, 39.0d, 35.0d, null),
      Row("219385581", d("2017-12-01"), 35.0d, 35.0d, 35.0d, 35.0d, 35.0d),
      Row("219385581", d("2018-01-01"), null, 0.0d, 39.0d, 54.0d, 35.0d),
      Row("219385581", d("2022-03-01"), 54.0d, 54.0d, 54.0d, 54.0d, 54.0d),
      Row("737745998", d("2014-10-01"), 39.0d, 39.0d, 39.0d, 39.0d, 39.0d),
      Row("737745998", d("2015-01-01"), null, 0.0d, 39.0d, 76.0d, 39.0d),
      Row("737745998", d("2015-02-01"), 76.0d, 76.0d, 76.0d, 76.0d, 76.0d),
      Row("737745998", d("2015-08-01"), 92.0d, 92.0d, 92.0d, 92.0d, 92.0d),
      Row("737745998", d("2016-06-01"), 6.0d, 6.0d, 6.0d, 6.0d, 6.0d))),
    StructType(Seq(
      StructField("siren", StringType, nullable = false),
      StructField("période", DateType, nullable = false),
      StructField("ca", DoubleType, nullable = true),
      StructField("ca_filled_value", DoubleType, nullable = true),
      StructField("ca_filled_median", DoubleType, nullable = true),
      StructField("ca_filled_bfill", DoubleType, nullable = true),
      StructField("ca_filled_ffill", DoubleType, nullable = true))))

  private def checkFill(strategy: String, expectedCol: String): Unit = {
    val handler =
      if (strategy == "value")
        new MissingValuesHandler(Seq("ca"), value = Map("ca" -> 0.0))
      else new MissingValuesHandler(Seq("ca"), strategy = strategy)
    val out = handler.transform(mvhFixture).collect()
    out.foreach { r =>
      val got = Option(r.getAs[java.lang.Double]("ca"))
      val want = Option(r.getAs[java.lang.Double](expectedCol))
      assert(got == want, s"row $r: got $got want $want")
    }
  }

  test("MissingValuesHandler value fill (test_transform.py:101-132)") {
    checkFill("value", "ca_filled_value")
  }
  test("MissingValuesHandler median fill — n/2-th sample convention") {
    checkFill("median", "ca_filled_median")
  }
  test("MissingValuesHandler bfill per siren") {
    checkFill("bfill", "ca_filled_bfill")
  }
  test("MissingValuesHandler ffill per siren") {
    checkFill("ffill", "ca_filled_ffill")
  }

  test("MissingValuesDropper skips UDT columns (transform.py:322-329)") {
    import org.apache.spark.ml.linalg.Vectors
    import org.apache.spark.sql.functions.col
    // mid-pipeline shape: an assembled VectorUDT column with nulls must
    // pass through na.drop untouched; only the scalar column drops rows
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(java.lang.Double.valueOf(1.0), Vectors.dense(1.0, 2.0)),
        Row(java.lang.Double.valueOf(2.0), null),
        Row(null, Vectors.dense(3.0, 4.0)))),
      StructType(Seq(
        StructField("ca", DoubleType, nullable = true),
        StructField("features", org.apache.spark.ml.linalg.SQLDataTypes
          .VectorType, nullable = true))))
    val out = new MissingValuesDropper(Seq("ca", "features")).transform(df)
    // the null-vector row survives (UDT skipped); the null-ca row drops
    assert(out.count() == 2)
    assert(out.filter(col("features").isNull).count() == 1)
  }

  test("BinsOrdinalEncoder buckets the reference paydex bins incl ±inf " +
      "(standard.json:108-135, transform.py:115-168)") {
    // the reference's exact paydex bins, string bounds as in the JSON
    val bins: Seq[Seq[Any]] = Seq(
      Seq("-inf", "0"), Seq("0", "15"), Seq("15", "30"),
      Seq("30", "60"), Seq("60", "90"), Seq("90", "inf"))
    // Bucketizer semantics: bucket i is [sᵢ, sᵢ₊₁); outermost buckets
    // absorb ±inf
    val cases = Seq(
      -1e9 -> 0.0, -0.001 -> 0.0,
      0.0 -> 1.0, 14.999 -> 1.0,
      15.0 -> 2.0, 29.9 -> 2.0,
      30.0 -> 3.0, 59.99 -> 3.0,
      60.0 -> 4.0, 89.9 -> 4.0,
      90.0 -> 5.0, 1e9 -> 5.0)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(cases.map { case (v, exp) => Row(v, exp) }),
      StructType(Seq(
        StructField("paydex", DoubleType, nullable = false),
        StructField("expected", DoubleType, nullable = false))))
    val out = new BinsOrdinalEncoder("paydex", bins).transform(df).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("paydex_bin") == r.getAs[Double]("expected"),
        s"paydex=${r.getAs[Double]("paydex")}")
    }
    // non-contiguous/unsorted bins resolve via distinct-sorted bounds,
    // as the reference's np.unique does (transform.py:160-161)
    val shuffled: Seq[Seq[Any]] = Seq(Seq("15", "30"), Seq("-inf", "0"),
      Seq("90", "inf"), Seq("0", "15"), Seq("30", "60"), Seq("60", "90"))
    val out2 = new BinsOrdinalEncoder("paydex", shuffled).transform(df).collect()
    out2.foreach { r =>
      assert(r.getAs[Double]("paydex_bin") == r.getAs[Double]("expected"))
    }
  }

  test("TargetVariable labels failure within n months, null→0") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("a", d("2020-01-01"), d("2020-06-01")),
        Row("a", d("2020-04-01"), d("2020-06-01")),
        Row("b", d("2020-01-01"), null))),
      StructType(Seq(
        StructField("siren", StringType, nullable = false),
        StructField("période", DateType, nullable = false),
        StructField("date_jugement", DateType, nullable = true))))
    val out = new TargetVariable("date_jugement", "failure", nMonths = 3)
      .transform(df).orderBy("siren", "période").collect()
    assert(out.map(_.getAs[Int]("failure")).toSeq == Seq(0, 1, 0))
  }

  test("scd2: collapses runs, assigns validity intervals, flags current") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        // key 1: A A B B A — three islands
        Row(1L, d("2020-01-01"), 1L, "A"), Row(1L, d("2020-02-01"), 2L, "A"),
        Row(1L, d("2020-03-01"), 3L, "B"), Row(1L, d("2020-04-01"), 4L, "B"),
        Row(1L, d("2020-05-01"), 5L, "A"),
        // key 2: single revision — current from day one
        Row(2L, d("2020-01-01"), 6L, "X"),
        // key 3: null state then a value — null→C is a change
        Row(3L, d("2020-01-01"), 7L, null),
        Row(3L, d("2020-02-01"), 8L, "C"),
        // key 4: same-date tie broken by the tiebreak column
        Row(4L, d("2020-01-01"), 9L, "A"), Row(4L, d("2020-01-01"), 10L, "B"))),
      StructType(Seq(
        StructField("k", LongType, nullable = false),
        StructField("dt", DateType, nullable = false),
        StructField("rev", LongType, nullable = false),
        StructField("st", StringType, nullable = true))))
    val out = graft.operators.TimeOps.scd2(df, Seq("k"), Seq("st"), "dt", "rev")
      .orderBy("k", "valid_from", "rev")
      .select("k", "st", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getDate(2)).map(_.toString).orNull,
        Option(r.getDate(3)).map(_.toString).orNull, r.getBoolean(4)))
      .toSeq
    assert(out === Seq(
      (1L, "A", "2020-01-01", "2020-03-01", false),
      (1L, "B", "2020-03-01", "2020-05-01", false),
      (1L, "A", "2020-05-01", null, true),
      (2L, "X", "2020-01-01", null, true),
      (3L, null, "2020-01-01", "2020-02-01", false),
      (3L, "C", "2020-02-01", null, true),
      (4L, "A", "2020-01-01", "2020-01-01", false),
      (4L, "B", "2020-01-01", null, true)))
  }
}
