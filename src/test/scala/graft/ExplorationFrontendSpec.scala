package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.etl.Sirene
import graft.ml.{Exploration, Frontend}
import graft.sources.IO

class ExplorationFrontendSpec extends SparkSpec {

  test("one-way ANOVA matches a hand computation") {
    import spark.implicits._
    // two groups: [1,2,3] and [5,6,7] → ssbg = 24, sswg = 4
    val df = Seq((0, 1.0), (0, 2.0), (0, 3.0), (1, 5.0), (1, 6.0), (1, 7.0))
      .toDF("g", "x")
    val r = Exploration.oneWayAnova(df, "g", "x")
    assert(math.abs(r.ssbg - 24.0) < 1e-9)
    assert(math.abs(r.sswg - 4.0) < 1e-9)
    assert(r.dfBg == 1 && r.dfWg == 3)
    assert(math.abs(r.fStatistic - 24.0 / (4.0 / 3)) < 1e-9)
    assert(r.pValue > 0 && r.pValue < 0.05)
  }

  test("eigenspace projection recovers a rank-1 structure") {
    import spark.implicits._
    // points on the line y = 2x → first component captures ~everything
    val df = (1 to 50).map(i => (i.toString, i.toDouble, 2.0 * i))
      .toDF("siren", "f1", "f2")
    val space = Exploration.buildEigenspace(df, Seq("f1", "f2"), k = 2)
    assert(space.explainedVariance > 0.9999)
    val proj = Exploration.projectOnEigenspace(df, space, Seq("f1", "f2"),
      Seq("siren"))
    assert(proj.columns.toSeq == Seq("siren", "cp1", "cp2"))
    // second component carries ~no signal
    val cp2max = proj.agg(max(abs(col("cp2")))).first().getDouble(0)
    assert(cp2max < 1e-6)
  }

  test("alert levels + frontend documents") {
    import spark.implicits._
    val preds = Seq(("a", 0.9), ("b", 0.5), ("c", 0.1))
      .toDF("siren", "probability")
    val docs = Frontend.frontendDocuments(preds, "siren", "probability",
      thresholdF05 = 0.8, thresholdF2 = 0.3)
    val byId = docs.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId("a").contains("Alerte seuil F1/2"))
    assert(byId("b").contains("Alerte seuil F2"))
    assert(byId("c").contains("Pas d'alerte"))
    assert(byId("a").contains("\"Risque de défaillance\":90.0"))
  }

  test("latest-wins prediction merge") {
    import spark.implicits._
    val v1 = Seq(("a", 0.1), ("b", 0.2)).toDF("siren", "p")
    val v2 = Seq(("b", 0.9), ("c", 0.3)).toDF("siren", "p")
    val merged = Frontend.mergePredictions(Seq(v1, v2), "siren")
      .orderBy("siren").collect()
    assert(merged.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("a", 0.1), ("b", 0.9), ("c", 0.3)))
  }

  test("sirene categorical: head-office filter + region decode") {
    import spark.implicits._
    val et = Seq(
      ("111111111", "11111111100011", true, "69001", "6420Z"),
      ("111111111", "11111111100022", false, "75001", "4110A"),
      ("222222222", "22222222200011", true, "97101", "0111Z"))
      .toDF("siren", "siret", "etablissementSiege",
        "codeCommuneEtablissement", "activitePrincipaleEtablissement")
    val ul = Seq(("111111111", "5710"), ("222222222", "5499"))
      .toDF("siren", "categorieJuridiqueUniteLegale")
    val out = Sirene.categorical(et, ul).orderBy("siren").collect()
    assert(out.length == 2) // non-head-office row dropped
    assert(out(0).getAs[String]("région") == "Auvergne-Rhône-Alpes")
    assert(out(1).getAs[String]("région") == "Guadeloupe")
    assert(out(0).getAs[String]("catégorie_juridique") == "5710")
  }

  test("io: csv/orc/parquet round-trips preserve data") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("io").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", -2.25)).toDF("id", "s", "v")
    IO.writeCsv(df, s"$dir/csv", sep = "|")
    IO.writeOrc(df, s"$dir/orc")
    IO.writeParquetSingle(df, s"$dir/pq")
    val csvBack = IO.readCsv(spark, s"$dir/csv", sep = "|")
    val orcBack = IO.readOrc(spark, s"$dir/orc")
    val pqBack = IO.readParquet(spark, s"$dir/pq")
    for (back <- Seq(csvBack, orcBack, pqBack)) {
      assert(back.orderBy("id").collect().map(_.toSeq).toSeq ==
        df.orderBy("id").collect().map(_.toSeq).toSeq)
    }
    // single-file parquet: exactly one part file
    assert(new java.io.File(s"$dir/pq").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
    // lowercase re-projection
    assert(IO.lowercaseColumns(df.toDF("ID", "S", "V")).columns.toSeq ==
      Seq("id", "s", "v"))
  }
}
