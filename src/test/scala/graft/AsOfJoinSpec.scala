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
